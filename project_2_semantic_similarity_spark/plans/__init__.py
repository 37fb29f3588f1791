"""Query/oracle registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``."""

from project_2_semantic_similarity_spark.plans.registry import (
    ORACLES,
    QUERIES,
    query,
)

__all__ = ["QUERIES", "ORACLES", "query"]
