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

The per-partition count branch and the ranking branch share the range
exchange (ReusedExchange); the offset table is metadata-sized
(n_partitions rows) regardless of data volume.
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
    ranged = (
        df.repartitionByRange(n, *sort_cols)
        .withColumn(_PID, F.spark_partition_id())
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
