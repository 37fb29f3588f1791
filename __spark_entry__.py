"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``project_2_semantic_similarity_spark``; this
module only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    import os
    import sys

    repo_root = os.path.dirname(os.path.abspath(__file__))
    if repo_root not in sys.path:  # robust to any caller cwd
        sys.path.insert(0, repo_root)
    from project_2_semantic_similarity_spark.plans import registry

    registry.load_all()
    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference app.py:115-181 end-to-end): TF-IDF
    term-term cosine similarity, top-5 for query term 'join', on the
    sf0.001 documents corpus."""
    reg = _registry()
    return reg.QUERIES["flagship_term_similarity"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B.

    Ordered for the driver's per-round verification window: the
    flagship, queries changed this round, and never-driver-verified
    names first, then oldest-last-verified first (derived from the
    CORRECTNESS_r*.json artifacts at load time; see
    plans/registry.py:ordered_queries).
    """
    return _registry().ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted ⇒
    rows-only check for non-SQL-expressible/approximate ops)."""
    return _registry().ordered_oracles()
