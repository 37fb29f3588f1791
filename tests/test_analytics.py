"""Event-analytics and PageRank operator tests (plans/q_analytics.py):
semantic invariants on top of the driver's oracle hash checks —
cohort-matrix identities, attribution window constraints,
hour->day rollup consistency, and PageRank mass conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_analytics import (
    events_attribution,
    events_retention,
    events_rollup_hypertable,
    graph_pagerank,
    graph_pagerank_step,
)
from project_2_semantic_similarity_spark.sources import load_table


def test_retention_day0_counts_every_user(spark, sf_dir):
    """Every user is active on their own cohort day by construction,
    so the sum of day_offset=0 counts across cohorts equals the
    number of distinct users."""
    ret = events_retention(spark, sf_dir)
    day0 = (ret.filter(F.col("day_offset") == 0)
            .agg(F.sum("n_users")).first()[0])
    n_users = (load_table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    assert day0 == n_users


def test_retention_monotone_columns(spark, sf_dir):
    """Offsets are bounded to the declared horizon and counts are
    positive (a zero row would mean an empty group was emitted)."""
    rows = events_retention(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.day_offset <= 30 for r in rows)
    assert all(r.n_users >= 1 for r in rows)


def test_attribution_covers_every_purchase_exactly_once(spark, sf_dir):
    """LEFT semantics: one output row per purchase, attributed or
    not — the window's rn=1 filter must never drop or duplicate a
    purchase."""
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    att = events_attribution(spark, sf_dir)
    assert att.count() == n_purchases
    assert att.select("purchase_id").distinct().count() == n_purchases


def test_attribution_touch_inside_window(spark, sf_dir):
    """Every attributed touch is a click/view by the same user at or
    before the purchase, strictly inside the 1-hour lookback."""
    ev = load_table(spark, sf_dir, "events")
    att = events_attribution(spark, sf_dir).filter(
        F.col("touch_id").isNotNull())
    p = ev.select(F.col("event_id").alias("purchase_id"),
                  F.col("ts").alias("p_ts"),
                  F.col("user_id").alias("p_user"))
    t = ev.select(F.col("event_id").alias("touch_id"),
                  F.col("ts").alias("t_ts"),
                  F.col("user_id").alias("t_user"),
                  F.col("event_type").alias("t_type"))
    joined = att.join(p, "purchase_id").join(t, "touch_id")
    bad = joined.filter(
        (F.col("t_user") != F.col("p_user"))
        | (F.col("t_ts") > F.col("p_ts"))
        | (F.col("t_ts") <= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        | (~F.col("t_type").isin("click", "view"))
    ).count()
    assert bad == 0


def test_rollup_day_grain_consistent_with_direct_agg(spark, sf_dir):
    """The daily grain computed FROM HOURLY PARTIALS must equal a
    direct daily aggregation over raw events — the cascade
    re-aggregates unrounded partials, so no drift is tolerated beyond
    the 2 dp edge rounding."""
    out = events_rollup_hypertable(spark, sf_dir)
    day = out.filter(F.col("grain") == "day")
    ev = load_table(spark, sf_dir, "events")
    direct = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("bucket"), "event_type",
    ).agg(F.count("*").cast("bigint").alias("n_events"),
          F.round(F.sum("value"), 2).alias("sum_value"))
    diff = (day.select("bucket", "event_type", "n_events", "sum_value")
            .exceptAll(direct)).count()
    assert diff == 0


def test_rollup_hour_rows_sum_to_event_count(spark, sf_dir):
    out = events_rollup_hypertable(spark, sf_dir)
    hour_total = (out.filter(F.col("grain") == "hour")
                  .agg(F.sum("n_events")).first()[0])
    assert hour_total == load_table(spark, sf_dir, "events").count()


def test_pagerank_conserves_total_mass(spark, sf_dir):
    """With symmetric edges (no dangling nodes) and uniform init 1.0,
    total rank is invariant: sum r' = 0.15*n + 0.85*sum r = n at
    every iteration."""
    ranks = graph_pagerank(spark, sf_dir)
    n = ranks.count()
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(n, rel=1e-6)


def test_pagerank_step_matches_manual_tiny_graph(spark, sf_dir):
    """The single-iteration op on the real tables obeys the update
    rule spot-checked on one node: r'(v) = 0.15 + 0.85 * sum over
    in-edges of 1/outdeg(src) (uniform init makes contributions
    degree-only)."""
    li = load_table(spark, sf_dir, "lineitem")
    rel = li.select("l_partkey", "l_suppkey").distinct()
    # pick the first part (deterministic min key) and compute its
    # expected rank by hand: in-edges come from its suppliers, each
    # supplier's outdeg is its distinct part count
    part = rel.agg(F.min("l_partkey")).first()[0]
    sups = [r.l_suppkey for r in
            rel.filter(F.col("l_partkey") == part).collect()]
    outdeg = {r.l_suppkey: r.cnt for r in
              rel.filter(F.col("l_suppkey").isin(sups))
              .groupBy("l_suppkey")
              .agg(F.countDistinct("l_partkey").alias("cnt")).collect()}
    expected = 0.15 + 0.85 * sum(1.0 / outdeg[s] for s in sups)
    got = (graph_pagerank_step(spark, sf_dir)
           .filter(F.col("node") == f"p{part}").first().rank)
    assert got == pytest.approx(expected, abs=1e-6)
