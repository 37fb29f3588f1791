"""Unit tests for custom join operators and relational edge cases on
literal DataFrames (SURVEY.md §5.2.5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.operators.joins import (
    asof_join,
    theta_range_join,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00")),
         (2, 10, ts("2024-01-01 12:00:00")),
         (3, 20, ts("2024-01-01 09:00:00"))],
        ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(101, 10, ts("2024-01-01 09:30:00")),
         (102, 10, ts("2024-01-01 11:00:00")),
         (103, 20, ts("2024-01-01 09:30:00"))],  # after left -> no match
        ["click_id", "user_id", "ts"])
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="ts", right_cols=["click_id"])
    m = {r.event_id: r.asof_click_id for r in out.collect()}
    assert m == {1: 101, 2: 102, 3: None}


def test_asof_join_equal_ts_matches(spark):
    # A right row AT the left ts is eligible (<= semantics).
    t = ts("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, 5, t)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(9, 5, t)], ["click_id", "user_id", "ts"])
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["click_id"])
    assert out.collect()[0].asof_click_id == 9


def test_asof_join_respects_key_boundary(spark):
    # Right rows of another user never bleed across.
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(9, 2, ts("2024-01-01 09:00:00"))], ["click_id", "user_id", "ts"])
    out = asof_join(left, right, ["user_id"], "ts", "ts", ["click_id"])
    assert out.collect()[0].asof_click_id is None


def test_theta_range_join(spark):
    a = spark.createDataFrame([(1, 1, 10), (2, 1, 20)], ["id", "k", "v"])
    b = spark.createDataFrame(
        [(1, 12), (1, 25), (2, 11)], ["k", "w"])
    cond = (F.col("w") > F.col("v")) & (F.col("w") <= F.col("v") + 5)
    out = theta_range_join(
        a.select("id", "k", "v"), b, ["k"], cond).collect()
    assert {(r.id, r.w) for r in out} == {(1, 12), (2, 25)}


def test_approx_count_distinct_bound(spark, sf_dir):
    import __spark_entry__ as e
    rows = e.queries()["agg_approx_count_distinct"](spark, sf_dir).collect()
    from project_2_semantic_similarity_spark.sources import load_table
    li = load_table(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: r.x for r in li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("x")).collect()}
    for r in rows:
        rel = abs(r.approx_parts - exact[r.l_returnflag]) / exact[r.l_returnflag]
        assert rel < 0.1, f"{r.l_returnflag}: {r.approx_parts} vs {exact}"


def test_hll_portable_bound(spark, sf_dir):
    """The hand-rolled portable HLL (m=256) must land within ~3/√m ≈
    20% of the exact distinct count (the paper's σ ≈ 1.04/√m = 6.5%;
    3σ gives headroom for one unlucky register layout)."""
    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.sources import load_table
    row = e.queries()["agg_hll_portable"](spark, sf_dir).collect()[0]
    exact = load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("x")).collect()[0].x
    assert abs(row.approx_distinct - exact) / exact < 0.2, (
        row.approx_distinct, exact)


def test_quantile_hist_bound(spark, sf_dir):
    """Histogram quantiles must sit within one bucket width of the
    exact quantile — the operator's stated error contract."""
    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.sources import load_table
    got = {r.quantile: r.approx_value
           for r in e.queries()["agg_quantile_hist"](
               spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    st = li.agg(F.min("l_extendedprice").alias("lo"),
                F.max("l_extendedprice").alias("hi")).collect()[0]
    width = (float(st.hi) - float(st.lo)) / 1024
    for q, approx in got.items():
        exact = li.agg(F.expr(
            f"percentile(l_extendedprice, {q})").alias("x")).collect()[0].x
        assert abs(approx - float(exact)) <= width + 1e-9, (q, approx, exact)


def test_events_ns_timestamp_reads(spark, sf_dir):
    from project_2_semantic_similarity_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    r = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert r.lo.year == 2024 and r.hi.year == 2024


def test_topk_per_group_two_stage_equals_direct(spark, sf_dir):
    """The salted two-stage per-group top-k must equal the direct
    single-window formulation row-for-row (with the deterministic
    orderkey tie-break)."""
    from pyspark.sql import Window

    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.sources import load_table

    got = sorted(tuple(r) for r in
                 e.queries()["topk_per_group"](spark, sf_dir).collect())
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = sorted(tuple(r) for r in
                  o.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3).drop("rn").collect())
    assert got == want and len(got) > 0


def test_corpus_prep_pipeline_stages(spark, sf_dir):
    """Pipeline output must be a subset of the quality-kept set, keep
    at most one doc per content hash, and contain no near-dup pair
    (J >= 0.5) internally."""
    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.operators import dedup as D
    from project_2_semantic_similarity_spark.plans.q_textlab import (
        _PREP_MIN_JACCARD)
    from project_2_semantic_similarity_spark.sources import load_table

    out = e.queries()["corpus_prep_pipeline"](spark, sf_dir)
    kept_ids = {r.doc_id for r in out.collect()}
    assert kept_ids
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isin(list(kept_ids)))
    # no exact dups survive
    hashes = D.exact_dedup(docs).agg(F.max("group_size")).collect()[0][0]
    assert hashes == 1
    # no near-dup pair survives inside the kept set
    pairs = D.jaccard_pairs(D.shingles(docs), _PREP_MIN_JACCARD).count()
    assert pairs == 0


def test_approx_percentile_bound(spark, sf_dir):
    """GK-sketch quantiles must land within 1% relative rank error of
    the exact values (accuracy=1000 -> eps=0.001; 1% gives headroom
    for value-space translation on this distribution)."""
    import __spark_entry__ as e
    approx = {r.l_returnflag: (r.approx_median_price, r.approx_p95_price)
              for r in e.queries()["agg_approx_percentile"](
                  spark, sf_dir).collect()}
    exact = {r.l_returnflag: (r.median_price, r.p95_price)
             for r in e.queries()["agg_percentile"](
                 spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for flag in exact:
        for a, x in zip(approx[flag], exact[flag]):
            assert abs(a - x) / x < 0.01, (flag, a, x)


def test_with_global_rank_matches_global_window(spark):
    """Property: with_global_rank == row_number over a global sort,
    for data with heavy ties and uneven range distribution; and
    ntile_from_rank == SQL ntile for several bucket counts including
    n > rows."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from project_2_semantic_similarity_spark.operators.rank import (
        ntile_from_rank, with_global_rank)

    pdf = pd.DataFrame({
        "k": [i % 7 for i in range(500)],          # heavy ties
        "v": [(i * 37) % 13 - 6 for i in range(500)],
        "id": list(range(500)),
    })
    df = spark.createDataFrame(pdf)
    keys = [F.col("k").asc(), F.col("v").desc(), F.col("id").asc()]

    got = with_global_rank(df, keys, rank_col="rn", with_total="n")
    w = Window.orderBy(*keys)
    want = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    g = {r["id"]: r["rn"] for r in got.collect()}
    e = {r["id"]: r["rn"] for r in want.collect()}
    assert g == e

    rows = got.select("rn", "n",
                      *[ntile_from_rank(F.col("rn"), F.col("n"), nb)
                        .alias(f"t{nb}") for nb in (2, 5, 7, 600)])
    ref = want.select(
        "rn", *[F.ntile(nb).over(w).cast("bigint").alias(f"t{nb}")
                for nb in (2, 5, 7, 600)])
    got_t = {r["rn"]: (r["t2"], r["t5"], r["t7"], r["t600"])
             for r in rows.collect()}
    ref_t = {r["rn"]: (r["t2"], r["t5"], r["t7"], r["t600"])
             for r in ref.collect()}
    assert got_t == ref_t


def test_grouped_quantiles_exact_matches_builtin_percentile(spark):
    """Property: the rank-machinery quantile plan equals Spark's
    exact percentile aggregate on random grouped data with ties,
    across quantiles including 0 and 1."""
    import pandas as pd
    import random as rnd

    from pyspark.sql import functions as F

    from project_2_semantic_similarity_spark.operators.rank import (
        grouped_quantiles_exact)

    r = rnd.Random(11)
    pdf = pd.DataFrame({
        "g": [r.choice("abcd") for _ in range(2000)],
        "v": [round(r.uniform(-100, 100), 2) for _ in range(2000)],
    })
    df = spark.createDataFrame(pdf)
    qs = {"q0": 0.0, "q25": 0.25, "q5": 0.5, "q9": 0.9, "q100": 1.0}
    got = {
        row["g"]: [row[k] for k in qs]
        for row in grouped_quantiles_exact(df, "g", "v", qs).collect()
    }
    want = {
        row["g"]: [row[k] for k in qs]
        for row in df.groupBy("g").agg(*[
            F.expr(f"percentile(v, {q})").alias(k)
            for k, q in qs.items()
        ]).collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])


def test_agg_percentile_plan_has_no_buffer_aggregate(spark, sf_dir):
    """agg_percentile must ride the range-partitioned rank plan: no
    ObjectHashAggregate (the buffer-collecting percentile builtin),
    range partitioning present, offsets attached by broadcast."""
    import tests.test_plan_shape as ps

    plan = ps.plan_of(spark, "agg_percentile", sf_dir)
    assert "percentile(" not in plan
    # the range exchange lives BEHIND with_global_rank's
    # localCheckpoint (r9: pins both branches to one set of sampled
    # boundaries), so the visible plan shows the checkpointed scan
    # carrying the partition-id column instead
    assert "rangepartitioning" in plan or "__grk_pid" in plan
    assert "BroadcastHashJoin" in plan
    ps._single_partition_exchanges_are_metadata_sized(plan)


def test_rank_machinery_edge_cases(spark):
    """Empty input and single-row input through with_global_rank and
    grouped_quantiles_exact — the degenerate shapes a refactor most
    easily breaks."""
    import pandas as pd

    from pyspark.sql import functions as F

    from project_2_semantic_similarity_spark.operators.rank import (
        grouped_quantiles_exact, with_global_rank)

    schema = "g string, v double"
    empty = spark.createDataFrame([], schema)
    assert with_global_rank(
        empty, [F.col("v").asc()], rank_col="rn").count() == 0
    assert grouped_quantiles_exact(
        empty, "g", "v", {"q5": 0.5}).count() == 0

    one = spark.createDataFrame(pd.DataFrame(
        {"g": ["a"], "v": [3.5]}))
    rows = with_global_rank(
        one, [F.col("v").asc()], rank_col="rn",
        with_total="n").collect()
    assert [(r["rn"], r["n"]) for r in rows] == [(1, 1)]
    q = grouped_quantiles_exact(one, "g", "v",
                                {"q0": 0.0, "q5": 0.5, "q1": 1.0})
    assert [(r["q0"], r["q5"], r["q1"]) for r in q.collect()] \
        == [(3.5, 3.5, 3.5)]


def test_grouped_quantiles_ignore_nulls(spark):
    """NULL values must be ignored (SQL percentile semantics), not
    ranked — a NULL sorting first/last would shift every bracket."""
    import pandas as pd

    from pyspark.sql import functions as F

    from project_2_semantic_similarity_spark.operators.rank import (
        grouped_quantiles_exact)

    pdf = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "v": [1.0, None, 3.0, None, 5.0, 2.0, None, 4.0],
    })
    df = spark.createDataFrame(pdf)
    got = {r["g"]: r["q5"]
           for r in grouped_quantiles_exact(
               df, "g", "v", {"q5": 0.5}).collect()}
    want = {r["g"]: r["q5"]
            for r in df.groupBy("g").agg(
                F.expr("percentile(v, 0.5)").alias("q5")).collect()}
    assert got == want == {"a": 3.0, "b": 3.0}
