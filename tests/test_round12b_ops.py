"""Tests for the second round-12 batch: label propagation (incl. the
2-clique oscillation guard), the native-XML scan, VARIANT path
extraction, and the lateral join's decorrelation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_analytics import (
    graph_label_propagation,
)


def test_lpa_fixture_communities_and_no_oscillation(spark, tmp_path):
    """Two cliques through the real query path (orders parquet):
    customer 7 has TWO orders (the sync-LPA oscillation case — pure
    synchronous LPA flips a 2-clique forever; self-inclusion must
    converge it) and customer 8 has three."""
    rows = [
        # (o_orderkey, o_custkey, o_orderdate, o_totalprice)
        (11, 7), (12, 7),
        (21, 8), (22, 8), (23, 8),
        (31, 9),  # singleton: excluded by the n >= 2 contract
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long")
    df.write.parquet(f"{tmp_path}/orders.parquet")
    got = {r.node: r.community_id for r in
           graph_label_propagation(spark, str(tmp_path)).collect()}
    assert got == {11: 11, 12: 11, 21: 21, 22: 21, 23: 21}


def test_lpa_matches_closed_form_on_orders(spark, sf_dir):
    got = {r.node: r.community_id for r in
           graph_label_propagation(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_custkey").collect()
    by_cust: dict[int, list[int]] = {}
    for r in o:
        by_cust.setdefault(r.o_custkey, []).append(r.o_orderkey)
    expect = {k: min(ks) for ks in by_cust.values() if len(ks) >= 2
              for k in ks}
    assert got == expect


def test_scan_xml_roundtrip(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        scan_xml)

    got = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in scan_xml(spark, sf_dir).collect()}
    want = {r.n_nationkey: (r.n_name, r.n_regionkey)
            for r in spark.read.parquet(f"{sf_dir}/nation.parquet")
            .collect()}
    assert got == want


def test_variant_extraction_typed_paths(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        fn_json_variant)

    rows = {r.c_custkey: r for r in
            fn_json_variant(spark, sf_dir).collect()}
    cust = {r.c_custkey: r for r in
            spark.read.parquet(f"{sf_dir}/customer.parquet").collect()}
    assert set(rows) == set(cust)
    for k, r in rows.items():
        c = cust[k]
        assert r.name == c.c_name
        assert r.nation == c.c_nationkey
        assert r.bal == pytest.approx(round(c.c_acctbal, 2), abs=1e-9)
        assert r.n_tags == 2


def test_join_lateral_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL + LIMIT must decorrelate into one
    ranked window over a single orders shuffle — never a per-row
    re-execution (no nested-loop of two file scans) — and agree with
    the DataFrame top-k-per-group."""
    from pyspark.sql import Window

    from project_2_semantic_similarity_spark.plans.q_relational import (
        join_lateral)

    df = join_lateral(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    got = {(r.c_custkey, r.o_orderkey) for r in df.collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = {(r.o_custkey, r.o_orderkey) for r in
            o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2).collect()}
    assert got == want


def test_cusum_matches_python_recurrence(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_analytics import (
        events_changepoint_cusum)

    rows = events_changepoint_cusum(spark, sf_dir).collect()
    assert rows
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_type", F.col("ts").cast("date").alias("day"))
          .collect())
    daily: dict[tuple, int] = {}
    for r in ev:
        daily[(r.event_type, r.day)] = daily.get(
            (r.event_type, r.day), 0) + 1
    by_type: dict[str, list] = {}
    for (t, d), c in daily.items():
        by_type.setdefault(t, []).append((d, c))
    expect = {}
    for t, seq in by_type.items():
        seq.sort()
        mu = sum(c for _, c in seq) / float(len(seq))
        s = 0.0
        for d, c in seq:
            s = max(0.0, s + (c - mu))
            expect[(t, d.strftime("%Y-%m-%d"))] = (
                c, round(s, 6), int(s > 2.0 * mu))
    got = {(r.event_type, r.day): (r.cnt, r.cusum, r.breach)
           for r in rows}
    assert got == expect
    # the detector is one-sided: never negative, and a breach only
    # with a positive drift
    assert all(r.cusum >= 0 for r in rows)
    assert all(r.cusum > 0 for r in rows if r.breach)


def test_sql_udf_is_inlined_not_python(spark, sf_dir):
    """The SQL UDF must be INLINED by Catalyst — identical plan to
    writing the expression in place: whole-stage codegen, no Python
    stage, and the quantity filter still pushed to the scan."""
    import re

    from project_2_semantic_similarity_spark.plans.q_relational import (
        fn_sql_udf)

    df = fn_sql_udf(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # the UDF body appears INLINED inside the aggregate expression —
    # Catalyst substituted the SQL function like a macro
    assert re.search(r"partial_sum\(\(cast\(round", plan)
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan)
