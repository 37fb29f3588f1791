"""Property-based tests (hypothesis) for round-5 primitives: the
Morton interleave is invertible, KMV k-min is salt-invariant (the
identity the scale path relies on), and PageRank conserves rank mass
on arbitrary symmetric graphs — not just the declared bipartite one."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_interleave(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=50))
def test_zvalue_matches_reference_interleave(spark, pairs):
    """The Column-expression Morton code equals the bit-level
    reference for every (x, y) in the 8-bit domain — so deinterleave
    recovers the inputs and tile locality claims hold."""
    from project_2_semantic_similarity_spark.plans.q_relational import (
        zvalue)
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pairs:
        assert got[(x, y)] == _py_interleave(x, y)


@given(st.lists(st.integers(0, 2**60 - 1), min_size=1, max_size=400),
       st.integers(2, 32))
@settings(max_examples=50, deadline=None)
def test_kmv_kmin_is_salt_invariant(values, n_buckets):
    """k smallest of (k smallest per salt bucket) == k smallest
    overall — the exact identity that lets the KMV sketch run as a
    bounded two-stage aggregation at scale (operators/sketch.py
    kmv_sketch docstring). Pure-python property over the hash
    domain."""
    k = 64
    distinct = sorted(set(values))
    global_kmin = distinct[:k]
    buckets: dict[int, list[int]] = {}
    for v in set(values):
        buckets.setdefault(v % n_buckets, []).append(v)
    partials = []
    for b in buckets.values():
        partials.extend(sorted(b)[:k])
    assert sorted(partials)[:k] == global_kmin


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=30))
def test_pagerank_mass_conserved_on_arbitrary_symmetric_graph(
        spark, raw_edges):
    """pagerank_weighted conserves total rank (= |nodes|) on ANY
    dangling-free graph, not just the declared bipartite one: edges
    are hypothesis-generated, symmetrized, self-loops allowed."""
    from project_2_semantic_similarity_spark.operators.graph import (
        pagerank_weighted)
    sym = set()
    for a, b in raw_edges:
        sym.add((a, b))
        sym.add((b, a))
    edges = spark.createDataFrame(sorted(sym), "src long, dst long")
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    wedges = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
    ranks = pagerank_weighted(wedges, n_iters=3)
    n = ranks.count()
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - n) < 1e-6 * max(n, 1)


def test_passage_window_count_identity(spark):
    """Per doc with n >= W tokens, exactly n - W + 1 windows are
    emitted (none for shorter docs) — checked against an
    independently computed count."""
    from project_2_semantic_similarity_spark.plans.q_dedup import (
        _PASSAGE_W)
    texts = [(i, " ".join(f"t{i}x{j}" for j in range(i)))
             for i in range(0, 20)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
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
        ).alias("p"))
    got = {r.doc_id: r.n for r in
           win.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for i, text in texts:
        n_tok = len([t for t in text.split() if t])
        expect = max(n_tok - _PASSAGE_W + 1, 0)
        assert got.get(i, 0) == expect
