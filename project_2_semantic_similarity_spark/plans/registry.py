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


# The driver's correctness pass verifies queries in dict insertion
# order and (observed since round 1) covers a window of ~50 names per
# round.  Rather than hardcode any round's output, the ordering is
# derived from the CORRECTNESS_r*.json artifacts themselves at load
# time, with three tiers:
#
#   0. the flagship, plus every query whose BEHAVIOR changed this
#      round (_CHANGED_THIS_ROUND) and every query with no driver row
#      in ANY artifact (new queries) — changed code must never escape
#      independent re-verification;
#   1. everything else, oldest-last-verified first, so coverage
#      rotates through the full inventory across rounds and the union
#      of artifacts converges on all names.
#
# Update _CHANGED_THIS_ROUND whenever a commit changes what a declared
# query computes (plan shape changes that keep results identical count
# too — the driver's hash check is the independent signal that the
# change is in fact result-preserving).
_CHANGED_THIS_ROUND = frozenset(
    {
        # round 14 (r13 verdict #7): semdedup's pair stage became a
        # per-cluster dataflow gate — exact join under the size
        # bound UNIONed with a sign-LSH candidate branch for
        # oversized clusters. Result-preserving at every tested SF
        # (the oversized branch is empty there); the driver hash is
        # the independent check.
        "dedup_semdedup",
        # round 14 (r13 verdict #3): decode_image's BMP branch now
        # routes through decode_bmp_rgb (24-bit/4-bit support);
        # results identical for the 8-bit payloads this query
        # decodes, but the executed decode path changed.
        "multimodal_decode_bmp",
        # round 14 (r13 ADVICE): the plan expression moved to
        # streaming/ops.exponential_histogram with the multiplier
        # derived from the batch twin's _EXPHIST_SCALE — identical
        # expression, relocated code.
        "stream_histogram_exponential",
        # NOT listed (plan and results bit-identical at every tested
        # SF, only gate internals changed): knn_range_search's probe
        # memoization (same measured count, now cached per source
        # snapshot) and vocab_join's added size gate (the vocab sits
        # far under both bounds at every tested SF, so the chosen
        # join strategy is unchanged — unlike r13, where the CHOSEN
        # plan flipped and the family was listed).
    }
)
# r14 window composition (r13 verdict #1, checked programmatically):
# flagship + 1 never-verified new name (multimodal_decode_bmp_rgb) +
# 3 changed + the FULL 45-name r7 tier = 50 — the oldest tier drains
# COMPLETELY this round, leaving r8 (47 names) as the oldest for r15.


def _verified_rounds() -> dict[str, int]:
    """name -> latest round with a driver row (any outcome: a green
    hash match, a rows-only run, even an error — all mean the driver
    REACHED the name that round)."""
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES tiered for the driver's verification window: flagship /
    changed / never-driver-verified first, then oldest-verified first
    (stable within ties, so insertion order breaks them)."""
    verified = _verified_rounds()

    def key(name: str) -> tuple[int, int]:
        if name == "flagship_term_similarity":
            return (0, 0)
        if name in _CHANGED_THIS_ROUND or name not in verified:
            return (1, 0)
        return (2, verified[name])

    return dict(sorted(QUERIES.items(), key=lambda kv: key(kv[0])))


def ordered_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import project_2_semantic_similarity_spark.plans.q_analytics  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_dedup  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_functions  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_knn  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_quality  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_textlab  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_relational  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_sampling  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_streaming  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_text  # noqa: F401
    import project_2_semantic_similarity_spark.plans.q_udfs  # noqa: F401
