"""Structured Streaming operators (SURVEY.md §2.B "Streaming")."""

from project_2_semantic_similarity_spark.streaming.ops import (
    click_purchase_join,
    custom_state_totals,
    dedup_stream,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_avg,
    stage_events_dir,
    stream_to_parquet,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "stage_events_dir",
    "run_to_memory",
    "tumbling_counts",
    "sliding_avg",
    "session_counts",
    "dedup_stream",
    "click_purchase_join",
    "custom_state_totals",
    "stream_to_parquet",
]
