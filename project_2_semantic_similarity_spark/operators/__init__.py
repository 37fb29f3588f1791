"""Operator families. Each module exposes pure DataFrame→DataFrame
transforms (lazy Catalyst plans); nothing here collects data-sized
results to the driver."""
