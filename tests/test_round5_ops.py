"""Round-5 additions: binned range join, repeated-passage dedup,
distributed Gram matrix, TPC-H Q5 — semantic invariants beyond the
driver's oracle hash checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_dedup import (
    _PASSAGE_W,
    dedup_passage,
)
from project_2_semantic_similarity_spark.plans.q_knn import embedding_gram
from project_2_semantic_similarity_spark.plans.q_relational import (
    join_range_interval,
    sql_api_tpch_q5,
)
from project_2_semantic_similarity_spark.sources import load_table


def test_range_interval_matches_direct_theta_join(spark, sf_dir):
    """The binned equi-join + residual filter must return exactly what
    the direct (quadratic) inequality join returns — binning is a
    physical rewrite, never a semantic one."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 450000))
    li = load_table(spark, sf_dir, "lineitem")
    direct = (
        o.join(
            li,
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.to_date("l_shipdate")
               < F.date_add(F.to_date("o_orderdate"), 7)))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )
    binned = join_range_interval(spark, sf_dir)
    assert binned.exceptAll(direct).count() == 0
    assert direct.exceptAll(binned).count() == 0


def test_dedup_passage_short_docs_emit_no_windows(spark):
    """Docs shorter than W tokens contribute nothing (the
    sequence(0, negative) inversion guard): two identical short docs
    must NOT register as a repeated passage."""
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"),
         (3, "one two three four five six seven eight nine"),
         (4, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    import project_2_semantic_similarity_spark.plans.q_dedup as qd
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"),
                 lambda t: t != F.lit("")).alias("toks"))
    win = toks.filter(F.size("toks") >= _PASSAGE_W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - _PASSAGE_W),
                lambda i: F.md5(F.concat_ws(
                    " ", F.slice("toks", i + 1, _PASSAGE_W)))),
        ).alias("passage_md5"))
    rows = (win.groupBy("passage_md5")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= 2).collect())
    # only the 9-token twins share windows: positions 0 and 1 -> 2
    # shared 8-token passages; the 2-token docs contribute none
    assert len(rows) == 2
    assert all(r.n_docs == 2 for r in rows)


def test_dedup_passage_counts(spark, sf_dir):
    """Every reported passage occurs at least n_docs times and in at
    least 2 docs."""
    out = dedup_passage(spark, sf_dir)
    bad = out.filter(
        (F.col("n_docs") < 2)
        | (F.col("n_occurrences") < F.col("n_docs"))).count()
    assert bad == 0


def test_embedding_gram_diag_positive_and_matches_norms(spark, sf_dir):
    """G[i,i] = sum of squares of coordinate i — strictly positive for
    non-degenerate data, and G is the upper triangle only."""
    g = embedding_gram(spark, sf_dir).collect()
    assert all(r.i <= r.j for r in g)
    diag = {r.i: r.g for r in g if r.i == r.j}
    assert len(diag) == 64
    assert all(v > 0 for v in diag.values())
    # G[0,0] equals the directly-computed sum of squares of coord 0
    e = load_table(spark, sf_dir, "embeddings")
    direct = e.select(
        F.sum(F.pow(F.col("embedding")[0].cast("double"), 2))
        .alias("s")).first().s
    assert diag[0] == pytest.approx(direct, abs=1e-5)


def test_tpch_q5_revenue_positive_sorted(spark, sf_dir):
    rows = sql_api_tpch_q5(spark, sf_dir).collect()
    assert rows
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)
