"""Scale-safe global ranking: ``row_number() OVER (ORDER BY ...)``
without the single-partition window exchange.

A partition-less ``Window.orderBy(...)`` plans as ONE exchange to ONE
partition — the whole relation sorted by one task. Correct at sf0.01,
a stall at 100×. The scale-safe form (the classic two-pass
zipWithIndex, expressed as DataFrame ops so Catalyst/AQE still apply):

  1. ``repartitionByRange`` on the (tie-broken, therefore unique) sort
     key — N balanced, ordered, non-overlapping ranges;
  2. per-partition ``row_number`` windowed BY partition id — N
     parallel sorts, no global exchange;
  3. per-partition row counts -> cumulative offsets: an N-row
     (driver-sized) aggregate, broadcast back and added to the local
     row number.

The count branch and the ranking branch MUST observe the same range
boundaries. ReusedExchange usually guarantees that, but it is not a
contract: in nested plans (e.g. three chained rank passes, AQE
re-planning each) the two branches can re-execute the range exchange
with DIFFERENT sampled boundaries — offsets then describe partitions
the local ranks never saw, and a row's rank silently shifts with the
DOWNSTREAM plan (caught r9: orders_rfm quintiles at sf0.1 changed
value between passes). The ranged relation is therefore pinned with
localCheckpoint(eager=False): one materialization serves both
branches; the offset table stays metadata-sized (n_partitions rows)
regardless of data volume. The materialization is the data-sized
relation being ranked — in every caller an aggregate far smaller
than its input corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank"]

_PID = "__grk_pid"
_LRN = "__grk_lrn"
_OFF = "__grk_off"


def with_global_rank(
    df: DataFrame,
    sort_cols: list[Column],
    rank_col: str = "rn",
    num_partitions: int | None = None,
    with_total: str | None = None,
) -> DataFrame:
    """Add ``rank_col`` = 1-based position of each row under the total
    order ``sort_cols`` (which MUST be a unique ordering — include a
    tie-break key), computed with range partitioning + per-partition
    offsets instead of a global window.

    ``with_total``: optionally also attach the relation's total row
    count under this column name (free — it is the last cumulative
    offset; saves callers a second count pass, e.g. ntile math).
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # localCheckpoint: both consumers below MUST see the SAME range
    # boundaries (module note) — sampled boundaries are not stable
    # across re-executions of nested plans
    ranged = (
        df.repartitionByRange(n, *sort_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = ranged.withColumn(
        _LRN,
        F.row_number().over(Window.partitionBy(_PID).orderBy(*sort_cols)),
    )
    counts = ranged.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    # n_partitions rows: the cumulative sum is metadata-sized work, so
    # a single-partition window here is fine (it sorts ≤ a few
    # thousand rows at ANY data scale).
    woff = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias(_OFF),
        F.sum("_cnt").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__grk_total"),
    )
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
    )
    if with_total is not None:
        out = out.withColumn(
            with_total, F.col("__grk_total").cast("bigint"))
    return out.drop(_PID, _LRN, _OFF, "__grk_total")


def with_global_running_sum(
    df: DataFrame,
    sort_cols: list[Column],
    val_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
    with_total: str | None = None,
) -> DataFrame:
    """Add ``sum_col`` = cumulative sum of ``val_col`` under the total
    order ``sort_cols`` (MUST be unique — include a tie-break), with
    the same scale-safe shape as ``with_global_rank``: range
    partitions, per-partition running sums, and a broadcast
    metadata-sized offset table instead of a single-partition window.

    Exactness contract: use an INTEGRAL ``val_col``. The offset is
    the sum of prior partitions' totals, so floating-point input
    would accumulate in a different association than a sequential
    left-to-right scan — integer sums are association-free and land
    bit-identically in any engine.

    ``with_total``: optionally attach the grand total (the last
    cumulative offset; saves a second pass for share-of-total math).
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # same single-materialization contract as with_global_rank
    ranged = (
        df.repartitionByRange(n, *sort_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = ranged.withColumn(
        _LRN,
        F.sum(val_col).over(
            Window.partitionBy(_PID).orderBy(*sort_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    sums = ranged.groupBy(_PID).agg(F.sum(val_col).alias("_s"))
    woff = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = sums.select(
        _PID,
        F.coalesce(F.sum("_s").over(woff), F.lit(0)).alias(_OFF),
        F.sum("_s").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__grk_total"),
    )
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(sum_col, F.col(_OFF) + F.col(_LRN))
    )
    if with_total is not None:
        out = out.withColumn(with_total, F.col("__grk_total"))
    return out.drop(_PID, _LRN, _OFF, "__grk_total")


def grouped_quantiles_exact(
    df: DataFrame,
    group_col: str,
    val_col: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT continuous quantiles per group (the ANSI
    ``percentile_cont`` / DuckDB ``quantile_cont`` definition:
    position (n-1)·q, linear interpolation) computed WITHOUT a
    per-group value buffer.

    Spark's built-in exact ``percentile`` aggregate collects every
    (value, count) into an in-memory buffer per group and merges
    buffers across partitions — at sf0.1 that is already 24× the
    sf0.01 wall (11.8 s in the r6 sweep) and at 100× it is an
    executor-memory wall, not just time. This plan instead:

      1. range-partitions by (group, value) and ranks each row with
         the with_global_rank machinery (N parallel sorts, broadcast
         offsets — no single-partition exchange, no value buffer);
      2. reduces to per-group (first_rank, n) — a metadata-sized agg;
      3. derives the two bracketing ranks + interpolation weight per
         (group, quantile) in closed form, broadcasts that tiny
         target table back, and keeps ONLY the bracketing rows;
      4. sums value·weight per (group, quantile) and pivots.

    One range shuffle over the data + metadata-sized joins — the
    shape survives any scale; memory per task is a partition of
    scalar rows. ``qs``: output column name -> quantile fraction."""
    # NULL values are ignored, matching SQL percentile/quantile_cont;
    # a group whose values are ALL null emits no row (the aggregate
    # builtins would emit a NULL-valued row — callers needing that
    # degenerate shape should left-join groups back)
    sel = (df.select(F.col(group_col).alias("_g"),
                     F.col(val_col).cast("double").alias("_v"))
           .filter(F.col("_v").isNotNull()))
    # (_g, _v) is NOT a unique ordering — with_global_rank's contract
    # — so tied rows get nondeterministic rank ASSIGNMENT among
    # themselves. Tolerable HERE ONLY because tied values are
    # interchangeable for quantiles: whichever tied row lands on a
    # bracketing rank contributes the same _v. Do not copy this call
    # shape for rank-identity uses; add a unique tie-break key (as
    # sort_multi/orders_rfm do) when the rank itself is output.
    ranked = with_global_rank(
        sel, [F.col("_g").asc(), F.col("_v").asc()],
        rank_col="_r", num_partitions=num_partitions)
    bounds = ranked.groupBy("_g").agg(
        F.min("_r").alias("_base"), F.count("*").alias("_n"))
    # two bracketing target rows per (group, quantile): floor/ceil of
    # position (n-1)q with weights (1-frac)/frac; when frac == 0 the
    # rows coincide and the weights still sum the exact value once.
    targets = []
    for name, q in qs.items():
        pos = (F.col("_n") - 1) * F.lit(float(q))
        lo = F.floor(pos)
        frac = pos - lo
        targets.append(F.struct(
            F.lit(name).alias("qname"),
            (F.col("_base") + lo).cast("bigint").alias("_tr"),
            (F.lit(1.0) - frac).alias("w")))
        targets.append(F.struct(
            F.lit(name).alias("qname"),
            F.least(F.col("_base") + lo + 1,
                    F.col("_base") + F.col("_n") - 1).cast("bigint")
            .alias("_tr"),
            frac.alias("w")))
    # rename the target side before joining: tgt derives from ranked,
    # so same-name columns would be an ambiguous self-join reference
    tgt = (bounds.select("_g", F.explode(F.array(*targets)).alias("t"))
           .select(F.col("_g").alias("_tg"), "t.qname", "t._tr", "t.w"))
    picked = ranked.join(
        F.broadcast(tgt),
        (F.col("_g") == F.col("_tg")) & (F.col("_r") == F.col("_tr"))
    ).select("_g", "qname", (F.col("_v") * F.col("w")).alias("wv"))
    out = (picked.groupBy("_g").pivot("qname", list(qs))
           .agg(F.sum("wv")))
    return out.withColumnRenamed("_g", group_col)


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL ``ntile(n)`` reconstructed from a global rank + total count
    (both 1-based/bigint): the first ``total % n`` buckets get
    ``total div n + 1`` rows, the rest ``total div n`` — exactly the
    ANSI ntile fill rule, as closed-form arithmetic on the rank. Lets
    a quantile/bucket score ride the scale-safe rank machinery instead
    of its own partition-less window."""
    base = F.floor(total / n)
    rem = total % n
    big = rem * (base + F.lit(1))  # rows covered by the larger buckets
    return F.when(
        rank <= big, F.floor((rank - 1) / (base + 1)) + 1
    ).otherwise(
        rem + F.floor((rank - big - 1) / base) + 1
    ).cast("bigint")
