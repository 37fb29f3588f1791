"""Similarity search over embedding columns (SURVEY.md §2.B
knn_*): brute-force cosine top-k as the exact baseline, a
random-hyperplane-LSH bucketed variant as the scale path, and
label-centroid utilities.

Scale design: brute force is a broadcast of ONE query row against a
full scan — linear, embarrassingly parallel, the right answer for
one-off queries even at 100 TB. For all-pairs / high-QPS workloads
the LSH variant buckets vectors by sign patterns of random
projections so candidate generation is an equi-join on the bucket
key (IVF-style partition pruning would use a learned codebook
instead; same join shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.functions import (
    cosine_similarity,
    dot,
    l2_norm,
)


def knn_brute_force(embeddings: DataFrame, query_vec_id: int, k: int,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector. The query
    row (1 row) joins by broadcast cross-join; the scan stays fully
    parallel; top-k plans as TakeOrderedAndProject."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qvec"))
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine_similarity(vec_col, "__qvec").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (pure
    python stdlib RNG — stable across runs/machines)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_bucket(embeddings: DataFrame, dim: int, n_planes: int = 8,
               seed: int = 42, vec_col: str = "embedding"):
    """Attach a sign-pattern bucket id: bit i = sign(v · plane_i)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = sum(
        F.when(dot(F.col(vec_col),
                   F.array(*[F.lit(x) for x in p])) > 0,
               F.lit(2 ** i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        for i, p in enumerate(planes)
    )
    return embeddings.withColumn("bucket", bucket)


def knn_lsh(embeddings: DataFrame, query_vec_id: int, k: int, dim: int,
            n_planes: int = 8, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine re-ranking inside it. Recall is tunable via
    n_planes (fewer planes → bigger buckets → higher recall)."""
    bucketed = lsh_bucket(embeddings, dim, n_planes, seed, vec_col)
    qb = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("__qb"), F.col(vec_col).alias("__qvec"))
    return (
        bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("__qb"))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col,
                cosine_similarity(vec_col, "__qvec").alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def label_centroids(embeddings: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean vector per label: posexplode → per-(label,
    position) average → re-assemble ordered array. Two shuffles,
    both on small keys; at scale this is the classic 'explode is
    fine when the reduction is massive' pattern."""
    exploded = embeddings.select(
        label_col, F.posexplode(vec_col).alias("pos", "val"))
    by_pos = exploded.groupBy(label_col, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("avg_val"))
    return (
        by_pos.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "avg_val")))
             .alias("pairs"))
        .select(
            label_col,
            F.transform("pairs", lambda s: s["avg_val"]).alias("centroid"),
        )
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid ('inverted list'):
    broadcast the codebook (tiny by construction), score each vector
    against every centroid, keep the argmax — ties broken by lowest
    centroid label so the partitioning is deterministic. One scan,
    no shuffle of the vector relation."""
    from pyspark.sql import Window

    scored = (
        embeddings.crossJoin(F.broadcast(
            centroids.select(F.col("label").alias("list_id"), "centroid")))
        .withColumn("ccos", cosine_similarity(vec_col, "centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("ccos"), F.asc("list_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "list_id")
    )


def knn_ivf(embeddings: DataFrame, query_vec_id: int, k: int,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """IVF-style approximate top-k: vectors are partitioned into
    inverted lists by nearest codebook centroid (here the label
    centroids — a learned k-means codebook drops in identically);
    the query probes only its own list (nprobe=1) and re-ranks by
    exact cosine inside it.

    At scale this is the standard ANN partition-pruning shape: the
    corpus is written partitioned by list_id, a query reads 1/n_lists
    of the data, and the codebook broadcast is O(n_lists x dim)."""
    assigned = ivf_assign(embeddings, label_centroids(embeddings),
                          id_col, vec_col)
    q = assigned.filter(F.col(id_col) == query_vec_id).select(
        F.col("list_id").alias("__qlist"), F.col(vec_col).alias("__qvec"))
    return (
        assigned.join(F.broadcast(q), F.col("list_id") == F.col("__qlist"))
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col,
                cosine_similarity(vec_col, "__qvec").alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def nearest_centroid_per_label(embeddings: DataFrame,
                               label_col: str = "label",
                               vec_col: str = "embedding") -> DataFrame:
    """For each label, the most cosine-similar OTHER label's
    centroid (10×10 cross join of a tiny aggregate — broadcast)."""
    cents = label_centroids(embeddings, label_col, vec_col)
    a = cents.select(F.col(label_col).alias("label"),
                     F.col("centroid").alias("ca"))
    b = cents.select(F.col(label_col).alias("other_label"),
                     F.col("centroid").alias("cb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("label") != F.col("other_label"))
        .select("label", "other_label",
                cosine_similarity("ca", "cb").alias("cosine"))
    )
    # max of (cosine, other_label) struct: deterministic even under
    # cosine ties (lexicographic struct ordering).
    return pairs.groupBy("label").agg(
        F.max(F.struct("cosine", "other_label")).alias("best")
    ).select(
        "label",
        F.col("best.other_label").alias("nearest_label"),
        F.col("best.cosine").alias("cosine"),
    )
