"""Dense-vector math over ``array<float|double>`` columns using
Spark higher-order functions (``zip_with`` + ``aggregate``) — stays
JVM-side / codegen'd, no Python UDF in the hot path.

Used by the similarity-search operators (SURVEY.md §2.B knn_*) over
the ``embeddings.embedding`` column (64-dim float arrays).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str,
        unroll_dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ. DoubleType accumulator so float inputs don't lose
    precision during the fold.

    ``unroll_dim`` (r15, guide §4.1 "prefer codegen'd built-ins"):
    when the caller KNOWS the vector dimensionality, the fold is
    replaced — for rows of exactly that size — by a statically
    unrolled sum of ``a[i]*b[i]`` terms. Higher-order-function
    lambdas are CodegenFallback (interpreted per element inside an
    otherwise compiled stage); the unrolled chain participates in
    whole-stage codegen. Bit-identical by construction: the terms
    are added LEFT-ASSOCIATIVELY onto the same 0.0 seed, i.e. the
    exact IEEE operation sequence of the fold, and any row whose
    size differs from ``unroll_dim`` falls back to the fold itself."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    folded = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if unroll_dim is None:
        return folded
    acc = F.lit(0.0)
    for i in range(unroll_dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when(
        (F.size(a) == unroll_dim) & (F.size(b) == unroll_dim), acc
    ).otherwise(folded)


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


def quantize_scale(a: Column | str, bits: int = 8) -> Column:
    """Symmetric per-vector quantization scale: max|aᵢ| / (2^(b-1)-1).
    0.0 for an all-zero vector (callers emit zero codes there)."""
    a = F.col(a) if isinstance(a, str) else a
    qmax = float(2 ** (bits - 1) - 1)
    return F.array_max(
        F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(qmax)


def quantize_codes(a: Column | str, scale: Column,
                   bits: int = 8) -> Column:
    """Integer codes floor(aᵢ/scale + 0.5) — explicit floor(x + 0.5)
    rather than round() so the tie behavior is bit-identical across
    engines (DuckDB round half-away differs from Java HALF_UP only in
    edge representations; floor arithmetic is unambiguous). All-zero
    vectors (scale 0) quantize to zero codes."""
    a = F.col(a) if isinstance(a, str) else a
    return F.when(
        scale > 0,
        F.transform(a, lambda x: F.floor(x.cast("double") / scale + 0.5)
                    .cast("int")),
    ).otherwise(F.transform(a, lambda x: F.lit(0)))


def quantize_max_error(a: Column | str, scale: Column) -> Column:
    """max |aᵢ − dequant(quant(aᵢ))| — the reconstruction error bound
    actually achieved on this vector (≤ scale/2 by construction)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.when(
        scale > 0,
        F.array_max(F.transform(
            a,
            lambda x: F.abs(x.cast("double")
                            - F.floor(x.cast("double") / scale + 0.5)
                            * scale))),
    ).otherwise(F.lit(0.0))
