"""Dense-vector math over ``array<float|double>`` columns using
Spark higher-order functions (``zip_with`` + ``aggregate``) — stays
JVM-side / codegen'd, no Python UDF in the hot path.

Used by the similarity-search operators (SURVEY.md §2.B knn_*) over
the ``embeddings.embedding`` column (64-dim float arrays).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ. DoubleType accumulator so float inputs don't lose
    precision during the fold."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """√(Σ aᵢ²)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL when either norm is 0 (try_divide —
    Spark 4 ANSI mode would otherwise raise on zero vectors)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
