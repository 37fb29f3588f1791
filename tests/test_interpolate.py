"""Tests for win_interpolate_linear: hand-computed fixture values,
measured-row identity, boundary NULLs, and interior bounds on the
real events table."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_analytics import (
    win_interpolate_linear,
)


def test_interpolate_fixture(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # user 1: measure 10.0 @0s, views @10s/@30s, measure 50.0 @40s
        (1, 100, ts(0), "click", 10.0),
        (1, 101, ts(10), "view", 99.0),   # -> 10 + 40*(10/40) = 20
        (1, 102, ts(30), "view", 99.0),   # -> 10 + 40*(30/40) = 40
        (1, 103, ts(40), "buy", 50.0),
        # user 2: leading + trailing views stay NULL
        (2, 200, ts(0), "view", 1.0),
        (2, 201, ts(5), "click", 7.5),
        (2, 202, ts(9), "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double")
    p = f"{tmp_path}/events.parquet"
    df.write.parquet(p)
    out = {r.event_id: r for r in
           win_interpolate_linear(spark, str(tmp_path)).collect()}
    assert out[100].value_interp == 10.0
    assert out[101].value_interp == pytest.approx(20.0)
    assert out[102].value_interp == pytest.approx(40.0)
    assert out[103].value_interp == 50.0
    assert out[200].value_interp is None
    assert out[201].value_interp == 7.5
    assert out[202].value_interp is None


def test_interpolate_invariants_on_events(spark, sf_dir):
    rows = win_interpolate_linear(spark, sf_dir).collect()
    ev = {r.event_id: r.value for r in
          spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", F.round("value", 6).alias("value"))
          .collect()}
    n_measured = n_interp = 0
    for r in rows:
        if r.event_type != "view":
            # a measured row interpolates to exactly itself
            assert r.value_interp == pytest.approx(ev[r.event_id],
                                                   abs=1e-6)
            n_measured += 1
        elif r.value_interp is not None:
            n_interp += 1
    assert n_measured > 0 and n_interp > 0
