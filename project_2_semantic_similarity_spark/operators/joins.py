"""Join operators beyond Spark's built-in surface (SURVEY.md §2.B
"Joins"): as-of join and theta/range join helpers.

The reference has no joins at all (its query-vector attach at
app.py:153-162 is a closure-captured dict; re-expressed as a
broadcast join in operators/text.py) — these exist for the
relational/extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Sequence[str]) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key group
    (DuckDB/kdb ASOF JOIN semantics, left-outer flavor).

    Spark has no native as-of join. The naive form — inequality join
    then row_number — materializes every candidate pair, which is
    O(n·m) per key and explodes at scale. This implementation uses
    the union + sorted-window trick instead: tag both sides, union on
    the shared key/time axis, and carry the most recent right-side
    values forward with ``last(..., ignorenulls=True)`` over a window
    ordered by (ts, side). Cost: ONE shuffle (partition by key, sort
    by ts) regardless of fan-in — the plan a 100 TB run needs.

    Ties: a right row with ts equal to the left ts IS eligible
    (sorted before the left row via the side tag). If multiple right
    rows share (key, ts), the one latest in ``right_ts, side`` order
    wins deterministically only if callers dedupe; dedupe upstream
    for strict determinism.
    """
    lcols = list(left.columns)
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    # Rename right payload columns FIRST so a right column sharing a
    # left column's name (common for the ts column) never collides.
    tagged_right = right.select(
        *on,
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in on:
            tagged_right = tagged_right.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))

    unioned = tagged_left.unionByName(tagged_right)
    w = (Window.partitionBy(*on)
         .orderBy(F.col("__ts").asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    # Carry the whole right row as ONE struct so every attached value
    # comes from the SAME right row — per-column last(..., ignorenulls)
    # would backfill a NULL field from an older right row.
    carry = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]))
    filled = unioned.select(
        *lcols, "__side",
        F.last(carry, ignorenulls=True).over(w).alias("__b"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__b.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def asof_join_nearest(left: DataFrame, right: DataFrame,
                      on: Sequence[str], left_ts: str, right_ts: str,
                      right_cols: Sequence[str]) -> DataFrame:
    """For each left row, attach the right row NEAREST in time —
    either direction — within the same ``on`` key group (pandas
    ``merge_asof(direction='nearest')`` semantics, left-outer).

    Rides the same union + sorted-window machinery as ``asof_join``,
    with BOTH directions read off one sort: the backward candidate is
    ``last(..., ignorenulls)`` over the preceding frame, the forward
    candidate ``first(..., ignorenulls)`` over the following frame —
    one shuffle, one sort, two frame scans; never a candidate-pair
    join. Distances compare at microsecond precision; ties (equal
    distance both directions) resolve backward, deterministically.

    Callers should dedupe right rows per (key, ts) first — among
    same-timestamp right rows the carried one is sort-order
    dependent, same caveat as ``asof_join``."""
    lcols = list(left.columns)
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    tagged_right = right.select(
        *on,
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in on:
            tagged_right = tagged_right.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))

    unioned = tagged_left.unionByName(tagged_right).withColumn(
        "__ts_us", F.unix_micros(F.col("__ts").cast("timestamp")))
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    wb = (Window.partitionBy(*on).orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*on).orderBy(*order)
          .rowsBetween(0, Window.unboundedFollowing))
    fill_cols = list(right_cols)
    # Carry the whole right row — timestamp AND values — as ONE struct
    # so the attached values and the reported asof_dist_us are
    # atomically from the same right row. (Per-column carries could
    # backfill a NULL field from an older right row; a right row with
    # NULL right_ts contributes nothing at all.)
    carry_ok = (F.col("__side") == 0) & F.col("__ts_us").isNotNull()
    carry = F.when(carry_ok, F.struct(
        F.col("__ts_us").alias("__asof_us"),
        *[F.col(f"__r_{c}").alias(c) for c in fill_cols]))
    filled = unioned.select(
        *lcols, "__side", "__ts_us",
        F.last(carry, ignorenulls=True).over(wb).alias("__b"),
        F.first(carry, ignorenulls=True).over(wf).alias("__f"),
    )
    b_dist = F.col("__ts_us") - F.col("__b.__asof_us")
    f_dist = F.col("__f.__asof_us") - F.col("__ts_us")
    take_back = F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (b_dist <= f_dist))
    out = filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.when(take_back, F.col(f"__b.{c}"))
          .otherwise(F.col(f"__f.{c}")).alias(f"asof_{c}")
          for c in fill_cols],
        F.when(take_back, b_dist)
        .when(F.col("__f").isNotNull(), f_dist)
        .cast("bigint").alias("asof_dist_us"),
    )
    return out


def theta_range_join(left: DataFrame, right: DataFrame,
                     equi_keys: Sequence[str],
                     condition: Column,
                     how: str = "inner") -> DataFrame:
    """Equi-join on ``equi_keys`` plus an arbitrary non-equi conjunct
    (range/theta predicate). The equi keys let Spark hash-partition
    the join (shuffled-hash / sort-merge) and apply the range
    predicate as a post-join filter — without at least one equi key
    this degenerates to a broadcast-nested-loop join, which is the
    thing to avoid at scale."""
    cond = condition
    for k in equi_keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)
