"""Connected-components / dedup-clusters operator tests (ADVICE r3:
the transitive-closure semantics need direct coverage, including
string ids where lexicographic and numeric order disagree)."""

from __future__ import annotations

import pytest

from project_2_semantic_similarity_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_chain_collapses_transitively_numeric(spark):
    """a~b, b~c with no a~c pair must land in ONE component with the
    numeric-min representative — the case one-hop suppression
    (dedup_pipeline) cannot express."""
    pairs = spark.createDataFrame(
        [(10, 2), (10, 30), (7, 5)], "doc_a long, doc_b long")
    comp = {r.node: r.component_id
            for r in connected_components(pairs).collect()}
    assert comp == {2: 2, 10: 2, 30: 2, 5: 5, 7: 5}


def test_string_ids_use_lexicographic_min(spark):
    """String node ids are first-class (corpus doc_ids are strings in
    the text-corpus shape): the representative is the min under the
    column's natural ordering — for strings that is LEXICOGRAPHIC
    ('10' < '2'), and convergence must not assume numeric labels
    (round-3 ADVICE: sum-based convergence broke on exactly this)."""
    pairs = spark.createDataFrame(
        [("2", "10"), ("10", "30"), ("x", "y")],
        "doc_a string, doc_b string")
    comp = {r.node: r.component_id
            for r in connected_components(pairs).collect()}
    assert comp == {"2": "10", "10": "10", "30": "10", "x": "x", "y": "x"}


def test_dedup_clusters_sizes_and_membership(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 8)], "doc_a long, doc_b long")
    rows = dedup_clusters(pairs).collect()
    got = {r.doc_id: (r.component_id, r.component_size) for r in rows}
    assert got == {1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
                   8: (8, 2), 9: (8, 2)}


def test_raises_rather_than_partial_labeling(spark):
    """A diameter larger than max_rounds must raise — never silently
    return a partially-merged labeling."""
    chain = [(i, i + 1) for i in range(1, 8)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=2)


def test_keyed_persist_slot_is_session_scoped(spark):
    """Replacement slots fold the session's applicationId into the
    stored key (ADVICE r4: a stopped-and-recreated session in the
    same process must rebuild, not serve a dead-session DataFrame):
    a same-key call is a hit; tampering the stored app id must force
    a rebuild."""
    from project_2_semantic_similarity_spark.operators import cache

    df = cache.keyed_persist("t_scope", ("k1",), lambda: spark.range(3))
    app = spark.sparkContext.applicationId
    assert cache._SLOTS["t_scope"][0] == (("k1",), app)
    # same key, same session -> hit (builder not invoked)
    assert cache.keyed_persist(
        "t_scope", ("k1",),
        lambda: (_ for _ in ()).throw(AssertionError("rebuilt"))) is df
    # stale app id (simulated dead session) -> rebuild
    cache._SLOTS["t_scope"] = ((("k1",), "app-dead"), df)
    df2 = cache.keyed_persist("t_scope", ("k1",), lambda: spark.range(4))
    assert df2 is not df
    df2.unpersist()
    del cache._SLOTS["t_scope"]


def test_no_leaked_cache_entries(spark):
    """The operator must release every per-round persisted relation
    it created (round-3 ADVICE: the labels relation leaked). The one
    allowed survivor is the localCheckpoint backing the RESULT —
    that is the result's own storage, released when the returned
    DataFrame is garbage-collected, and its count stays 1 no matter
    how many propagation rounds ran."""
    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    # 3-chain: needs several rounds, each persisting a label relation
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    connected_components(pairs).collect()
    after = len(sc._jsc.getPersistentRDDs())
    assert after <= before + 1


def test_triangle_count_degree_ordered_literal(spark, tmp_path):
    """Degree-ordered triangle counting (r9: Suri-Vassilvitskii
    orientation replaced the id-ordered baseline) on a hand-built
    co-purchase graph: order 1 makes K4 over parts 1-4 (4 triangles,
    every corner in 3), order 2 adds a pendant edge 4-5 and order 3
    a disconnected pair 6-7 (no new triangles). The degree
    re-orientation must neither lose nor double-count any triangle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_2_semantic_similarity_spark.plans.registry import (
        QUERIES, load_all)

    load_all()
    d = str(tmp_path)
    rows = ([(1, p) for p in (1, 2, 3, 4)]
            + [(2, 4), (2, 5)]
            + [(3, 6), (3, 7)])
    pq.write_table(
        pa.table({"l_orderkey": pa.array([r[0] for r in rows],
                                         pa.int64()),
                  "l_partkey": pa.array([r[1] for r in rows],
                                        pa.int64())}),
        f"{d}/lineitem.parquet")
    got = {r.l_partkey: r.n_triangles
           for r in QUERIES["graph_triangle_count"](spark, d).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
