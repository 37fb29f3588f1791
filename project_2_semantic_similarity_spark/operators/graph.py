"""Graph operators for dedup clustering (SURVEY.md §2.B
"LLM-data-pipeline extensions"): connected components over a
near-duplicate pair relation, expressed as iterative DataFrame
min-label propagation.

Why this exists: pair-level dedup (jaccard_pairs, cosine pairs,
minhash candidates) yields EDGES; a training pipeline needs the
CLUSTERS those edges imply — "these 7 docs are all the same
article" — so it can keep exactly one representative per cluster.
One-hop suppression (dedup_pipeline) drops the b-side of each pair;
transitive closure additionally collapses chains a~b~c where (a, c)
was never itself a discovered pair.

Scale design: the classic MapReduce connected-components literature
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) shows label propagation converges in O(diameter) rounds;
near-dup graphs are star-/clique-like (duplicates of one source
article), so diameter is small and bounded rounds suffice. Each
round is one shuffle: an equi-join of the label relation with the
edge relation on the node key followed by a min-aggregate — both
hash-partitioned on node id, no skew beyond a cluster's degree.
Between rounds the label relation is persisted and the previous one
released, truncating lineage exactly like kmeans_train
(operators/similarity.py) so round N does not replay rounds 1..N-1.
Convergence is one count-aggregate per round over the rows whose
label changed — type-agnostic (string or numeric node ids), one
scalar driver action, never a data-sized collect."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_rounds: int = 20) -> DataFrame:
    """Connected components of the undirected graph given as a pair
    relation. Returns ``(node, component_id)`` for every node that
    appears in at least one pair, where ``component_id`` is the
    minimum node id in the component UNDER THE ID COLUMN'S NATURAL
    ORDERING (numeric min for numeric ids, lexicographic min for
    strings — either way a deterministic canonical representative;
    ``F.min``/``F.least`` and the fixed point all use that same
    order, so the propagation is monotone for any orderable type).

    The returned DataFrame is localCheckpoint-materialized: lineage
    is truncated and every per-round cache entry has been released —
    callers own no unpersist obligation.

    Raises ``RuntimeError`` if the propagation has not reached a
    fixed point after ``max_rounds`` (diameter larger than the
    bound) rather than returning a partially-merged labeling."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    cached = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels = cached
    try:
        for _ in range(max_rounds):
            # Min label among self + neighbors; per-node labels are
            # non-increasing in the column's ordering, so "no row
            # changed" is a true fixed point.
            neighbor_min = (
                edges.join(labels, edges["v"] == labels["node"])
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = (
                labels.withColumnRenamed("label", "old_label")
                .join(neighbor_min, "node", "left")
                .select(
                    "node", "old_label",
                    F.least(
                        F.col("old_label"),
                        F.coalesce(F.col("nbr_label"),
                                   F.col("old_label")),
                    ).alias("label"),
                )
                .persist()
            )
            n_changed = stepped.filter(
                F.col("label") != F.col("old_label")).count()
            cached.unpersist()
            cached = stepped
            labels = stepped.select("node", "label")
            if n_changed == 0:
                # Materialize off the per-round cache chain so the
                # last persisted relation can be released too.
                return labels.select(
                    "node", F.col("label").alias("component_id"),
                ).localCheckpoint(eager=True)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    finally:
        cached.unpersist()
        edges.unpersist()


def dedup_clusters(pairs: DataFrame, src: str = "doc_a",
                   dst: str = "doc_b") -> DataFrame:
    """Duplicate clusters from near-dup pairs: every clustered doc
    with its canonical representative (min doc id in the component,
    under the id column's natural ordering) and the cluster size.
    ``(doc_id, component_id, component_size)``, non-singleton
    components only (singletons never appear in a pair, hence carry
    no dedup decision)."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").cast("bigint").alias("component_size"))
    return (
        comp.join(sizes, "component_id")
        .select(F.col("node").alias("doc_id"), "component_id",
                "component_size")
    )


def pagerank_weighted(wedges: DataFrame, nodes: DataFrame | None = None,
                      n_iters: int = 5, damping: float = 0.85,
                      reset: float = 0.15) -> DataFrame:
    """PageRank over a DANGLING-FREE weighted edge relation
    ``(src, dst, w)`` where ``w`` is the src→dst contribution
    fraction (sum of w over each src's out-edges = 1). Returns
    ``(node, rank)`` after ``n_iters`` damped power iterations from
    uniform init 1.0. Node ids may be any equi-joinable type; pack
    composite identities into one column (bit-packed ints beat
    strings — measured ~2× on join+agg, plans/q_analytics.py).

    Dangling-freeness is the caller's contract (symmetrize the edge
    list, or pre-drop sink nodes): it makes the update closed-form —
    every node receives contributions, so no leaked-mass term and no
    per-round nodes left-join. With uniform init and this contract,
    total rank mass is invariant (= |nodes|) every iteration, which
    tests pin.

    Scale shape: the loop body touches ONLY persisted relations —
    wedges once, each round's ranks replacing the previous
    (persist-and-release, as connected_components above); per
    iteration one equi-join on src (rank relation ≪ edges —
    AQE broadcasts while it fits; Pregel-style src-pre-partitioning
    past that) and one map-side-combined agg on dst. Result is
    localCheckpoint-materialized: lineage truncated, callers own no
    unpersist obligation."""
    wedges = wedges.persist()
    if nodes is None:
        nodes = wedges.select(F.col("src").alias("node")).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    nodes = nodes.persist()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    prev = None
    for _ in range(n_iters):
        ranks = (
            wedges.join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(reset) + F.lit(damping) * F.col("contrib"))
                .alias("rank"))
        ).persist()
        ranks.count()  # materialize before releasing the parent round
        if prev is not None:
            prev.unpersist()
        prev = ranks
    result = ranks.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    wedges.unpersist()
    nodes.unpersist()
    return result
