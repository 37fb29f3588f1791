"""Registry mapping operator names (SURVEY.md §2.B) to
(spark, sf_dir) -> DataFrame callables and their DuckDB oracle SQL.

Every declared query follows the hash-matching rules (FIXTURES.md §3):
computed float columns are aliased AND rounded to 6 dp in BOTH the
Spark plan and the oracle SQL; top-k queries carry a total-order
tie-break; column names match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` declares a rows-only check
    (non-SQL-expressible / approximate ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import project_2_semantic_similarity_spark.plans.q_dedup  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_functions  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_knn  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_textlab  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_relational  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_streaming  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_text  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_udfs  # noqa: F401
