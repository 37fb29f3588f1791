"""Scalar/vector function helpers shared by operators and queries."""

from project_2_semantic_similarity_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    quantize_codes,
    quantize_max_error,
    quantize_scale,
)

__all__ = ["dot", "l2_norm", "cosine_similarity",
           "quantize_scale", "quantize_codes", "quantize_max_error"]
