"""UDF / UDAF / UDTF surface (SURVEY.md §2.B "UDF surface").

These exist to exercise and document the Python-extension path — each
has identical semantics to a built-in composition elsewhere in the
engine (shared oracles), demonstrating the preferred escalation order
from the build rules: built-ins first, Arrow-vectorized Pandas UDFs
when Python is unavoidable, row-at-a-time UDFs only as a last resort.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


@F.udf(StringType())
def normalize_term_udf(term: str) -> str | None:
    """Row-at-a-time Python UDF (the slow path, kept off hot paths):
    lowercase + strip non-alphanumeric edges."""
    if term is None:
        return None
    return term.strip().strip(".,;:!?\"'()[]{}").lower()


@F.udf(StringType(), useArrow=True)
def normalize_term_arrow_udf(term: str) -> str | None:
    """Same normalizer via the Arrow-optimized Python UDF path
    (Spark 3.5+): row-at-a-time author model, Arrow-batched
    transfer — the drop-in upgrade for legacy @udf code that can't
    be rewritten as a pandas_udf."""
    if term is None:
        return None
    return term.strip().strip(".,;:!?\"'()[]{}").lower()


@F.pandas_udf(DoubleType())
def tfidf_pandas_udf(tf_count: pd.Series, doc_len: pd.Series,
                     n_docs: pd.Series, df: pd.Series) -> pd.Series:
    """Arrow-vectorized TF-IDF scalar — same formula as
    operators/text.py tfidf() (reference app.py:58), computed in
    pandas batches. ~10-100× faster than the row UDF above."""
    return (tf_count / doc_len) * (n_docs / df).apply(math.log10)


def term_norms_applyinpandas(weights: DataFrame) -> DataFrame:
    """Grouped-map UDAF: per-term L2 norm of the tf-idf document
    vector via ``applyInPandas`` (equivalent to
    ``groupBy(term).agg(sqrt(sum(tfidf^2)))`` — built-in preferred;
    this demonstrates the custom-aggregate escape hatch)."""

    def per_term(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "term": [pdf["term"].iloc[0]],
            "norm": [float((pdf["tfidf"] ** 2).sum() ** 0.5)],
        })

    return (
        weights.select("term", "tfidf")
        .groupBy("term")
        .applyInPandas(per_term, schema="term string, norm double")
    )
