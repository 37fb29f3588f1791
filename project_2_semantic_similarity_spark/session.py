"""SparkSession factory.

Local-mode defaults tuned for the test harness (local[32], 128 GiB);
on a real cluster every setting here except the master is still the
right default: AQE on (runtime coalesce + skew-join split), UTC session
timezone (oracle parity with DuckDB), Arrow enabled for the Pandas-UDF
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "project2_semantic_similarity",
              cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``spark.sql.shuffle.partitions`` is set to the core count — at
    cluster scale this would instead be sized so post-shuffle
    partitions land near 128-256 MB; AQE's coalescePartitions then
    right-sizes small stages automatically. Rule of thumb: partitions
    ~= shuffle_bytes / 200 MB, and per-task execution memory (heap x
    spark.memory.fraction / cores) should exceed one partition, else
    hash aggs/joins spill. The token-sized window-ids family
    (corpus_context_window_ids & co.) additionally needs
    ``SPARK_DRIVER_MEM=48g`` at the 2M-doc probe scale — the 404M-row
    result materializes through the driver-side local runner; see
    SCALE.md.

    ``extra_conf`` overrides/extends the defaults (first builder call
    in the process wins — used by tools/probe_scale.py to enable the
    UI REST API for shuffle-volume accounting)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
