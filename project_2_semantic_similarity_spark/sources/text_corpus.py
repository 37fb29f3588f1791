"""Corpus sources.

The reference consumes a plain text file, one document per line,
whitespace-separated tokens, first token = document id
(reference ``app.py:11-16,119,121``).  Two ways to obtain that corpus
shape as a DataFrame ``(doc_id string, text string)``:

- ``read_text_corpus``: read a reference-format text file with
  ``spark.read.text`` and split id/body declaratively (replaces the
  reference's driver-side ``collect()`` + Python loop, app.py:11-17).
- ``corpus_from_documents``: adapt the driver's ``documents`` parquet
  table (``doc_id bigint, text string``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, path: str,
                     ascii_normalize: bool = False) -> DataFrame:
    """Read a reference-format corpus file -> (doc_id, text).

    ``ascii_normalize=True`` reproduces the reference's lossy ASCII
    step (app.py:124: ``x.encode('ascii','ignore')``) by stripping
    non-ASCII characters JVM-side.
    """
    lines = spark.read.text(path)
    value = F.col("value")
    if ascii_normalize:
        value = F.regexp_replace(value, r"[^\x00-\x7F]", "")
    trimmed = F.trim(value)
    return (
        lines
        .select(trimmed.alias("line"))
        .filter(F.length("line") > 0)
        # first whitespace-run separates the id from the body
        .select(
            F.regexp_extract("line", r"^(\S+)", 1).alias("doc_id"),
            F.trim(F.regexp_replace("line", r"^\S+\s*", "")).alias("text"),
        )
    )


def corpus_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the testdata ``documents`` table to the corpus shape."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"),
    )
