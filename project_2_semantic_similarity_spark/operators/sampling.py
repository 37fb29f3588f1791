"""Deterministic sampling / splitting operators for training-data
pipelines.

Both operators key every decision on a PORTABLE content hash —
``md5(salt ':' key)`` compared lexicographically on its hex prefix —
rather than an engine hash (Spark murmur3 and DuckDB's hash differ)
or an RNG (``rand()`` is partitioning-dependent, so a repartition
would silently reshuffle a training split). Lowercase hex compares
identically in every engine and the first 4 hex chars give 65,536
evenly-filled buckets, plenty of resolution for split fractions.

Scale shape: both are NARROW maps — no shuffle, no state, no
collect. Splitting a 100 TB corpus is one pass over the scan with
the filter/label pushed into the same stage; adding machines scales
it linearly. This is why the quota-style alternative (exact K per
stratum via a per-stratum window sort) is NOT the default: exact
quotas need a per-stratum global order, fraction thresholds don't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Tokens per packed training context window. Lives here (not in a
# plan module) so q_sampling and q_textlab can both read it without
# either plan module depending on the other's init order — the
# previous home (q_sampling module scope) made importing q_sampling
# before q_textlab raise ImportError on the partially-initialized
# circular pair (r10 advice).
CTX_WINDOW = 512


def _bucket(key: Column, salt: str) -> Column:
    """4-hex-char bucket label in ['0000', 'ffff'] — uniform over
    65,536 values, deterministic in (salt, key) only."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 4)


def hex_threshold(fraction: float) -> str:
    """The threshold t such that P(bucket < t) ==
    round(fraction * 65536) / 65536 (exact, not approximate).

    fraction == 1.0 returns the sentinel 'g': lexicographically it
    sorts after every hex string, so the comparison keeps all rows.
    (The naive format(65536, '04x') == '10000' would sort BEFORE
    'a3f2' and silently drop ~94% of a keep-everything stratum.)"""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * 65536)
    return "g" if v >= 65536 else format(v, "04x")


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Label every row with a deterministic split name.

    ``fractions`` maps split name -> fraction, in priority order;
    the remainder after the last named fraction falls into the final
    name (so {'train': .8, 'val': .1, 'test': .1} covers exactly).
    Same (salt, key) -> same split forever, on any cluster layout —
    the property a train/test split must have so later pipeline runs
    never leak validation docs into training.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    bucket = _bucket(F.col(key), salt)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", label)


def pack_shards(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Assign every document to a training shard of ~``budget_tokens``
    whitespace tokens: ``n_shards = ceil(total_tokens / budget)``,
    then hash-assign docs uniformly across shards.

    Deliberately NOT greedy bin-packing: an exact running-total pack
    is a global prefix sum — one ordered window over the entire
    corpus, i.e. a single-partition sort that cannot scale. Hash
    assignment needs one scalar aggregate (total token count,
    broadcast back) plus a narrow map, and by uniformity each shard
    lands within ~1/sqrt(docs_per_shard) of the budget — the right
    trade at 100 TB, where shards hold millions of docs and the
    relative deviation is negligible.

    shard_id = floor(bucket * n_shards / 65536) with bucket the
    md5-prefix integer in [0, 65535] — portable arithmetic (exact in
    doubles far below 2^53), identical in the DuckDB oracle.
    """
    from project_2_semantic_similarity_spark.functions.text_analysis import (
        n_tokens)

    counted = docs.select(
        F.col(id_col), n_tokens(F.col(text_col)).alias("n_tokens"))
    total = counted.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.sum("n_tokens") / F.lit(float(budget_tokens))),
        ).alias("n_shards"))
    bucket_int = F.conv(
        _bucket(F.col(id_col), salt), 16, 10).cast("long")
    return (
        counted
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "n_tokens",
            F.floor(bucket_int * F.col("n_shards") / F.lit(65536.0))
             .cast("long").alias("shard_id"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum: str,
    fractions: dict[str, float],
    key: str,
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows — the
    corpus-rebalancing op (downsample the dominant language, keep
    the rare ones whole). Strata not named in ``fractions`` keep
    ``default_fraction``. Same narrow one-pass shape as hash_split;
    the per-stratum threshold is a CASE over broadcast literals, so
    stratum skew is irrelevant (no grouping happens at all).
    """
    bucket = _bucket(F.col(key), salt)
    thr: Column | None = None
    for name, frac in fractions.items():
        cond = F.col(stratum) == F.lit(name)
        t = F.lit(hex_threshold(frac))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(hex_threshold(default_fraction))
    threshold = default if thr is None else thr.otherwise(default)
    return df.where(bucket < threshold)


def temperature_sample(
    df: DataFrame,
    stratum: str,
    temperature: float,
    target_fraction: float,
    key: str,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled source mixing — the standard LLM-pretraining
    rebalance: per-stratum keep rates ∝ count^(1/T), scaled so the
    expected kept total is ``target_fraction`` of the corpus and
    capped at 1. T=1 keeps natural proportions; T→∞ flattens toward
    uniform across strata, up-weighting small (usually higher-value)
    sources relative to the head.

    Deterministic: the per-doc keep decision compares the md5-derived
    uniform (65,536-bucket resolution, same ``_bucket`` idiom as
    hash_split) against the stratum's rate. Scale shape: one tiny
    per-stratum aggregate broadcast back over a narrow filter map —
    the corpus never shuffles; re-running on any partitioning yields
    the identical sample (the property an ablation-reproducible data
    mix needs). Expected-count semantics, not exact quotas — same
    deliberate trade as stratified_sample (exact quotas need a
    per-stratum global sort)."""
    counts = df.groupBy(stratum).agg(F.count("*").alias("n_s"))
    w = counts.withColumn(
        "w", F.pow(F.col("n_s").cast("double"),
                   F.lit(1.0 / temperature)))
    tot = w.agg(F.sum("w").alias("sw"),
                F.sum("n_s").cast("double").alias("n"))
    rates = (
        w.crossJoin(F.broadcast(tot))
        .select(
            stratum,
            F.least(
                F.lit(1.0),
                F.lit(target_fraction) * F.col("n") * F.col("w")
                / (F.col("sw") * F.col("n_s")),
            ).alias("rate"),
        )
    )
    u = (F.conv(_bucket(F.col(key), salt), 16, 10).cast("long")
         / F.lit(65536.0))
    return (
        df.join(F.broadcast(rates), stratum)
        .filter(u < F.col("rate"))
    )


def weighted_sample_es(df: DataFrame, key: str, weight: Column,
                       k: int, salt: str = "wsample") -> DataFrame:
    """Deterministic weighted k-sample without replacement
    (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws a
    uniform u from the portable md5 of its key and is ranked by
    u^(1/w); the k largest keys form a weighted sample in which a
    row's inclusion probability tracks its weight share. We rank by
    the monotone transform ln(u)/w (one transcendental instead of
    two; ordering identical), so the whole decision is reproducible
    from the key alone — rerunning on any partitioning, any engine,
    yields the same sample, the property a training-mixture draw
    must have for auditability.

    Scale shape: the u-draw is a narrow map; the selection is a
    global top-k by es_key, which Spark executes as
    TakeOrderedAndProject — per-partition k-heaps merged on the
    driver, NOT a global sort shuffle; cost O(n + k log k), driver
    memory O(k). Weights must be >= 1 (caller clamps); u in (0, 1]
    by construction so ln(u) is finite and <= 0.

    Returns (key, weight, es_key) for the k selected rows."""
    from project_2_semantic_similarity_spark.operators.dedup import (
        portable_hash60)
    domain = float(1 << 60)
    u = (portable_hash60(
        F.concat(F.lit(salt + ":"), F.col(key).cast("string")))
        .cast("double") + F.lit(1.0)) / F.lit(domain)
    scored = df.select(
        F.col(key),
        weight.cast("double").alias("weight"),
        (F.log(u) / weight.cast("double")).alias("es_key"))
    return scored.orderBy(F.col("es_key").desc(), F.col(key)).limit(k)
