"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``sw385/Project-2-Semantic-Similarity``
(TF-IDF term-term semantic similarity, reference ``app.py:1-187``),
re-expressed on Spark DataFrames/SQL/Catalyst, plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis, streaming).

Design rules (see SURVEY.md §4.2):
- DataFrame/SQL only — every operator is a lazy Catalyst plan; no RDDs.
- No ``collect()`` of data-sized results inside operators; scalars stay
  in-plan via broadcast cross-joins of 1-row aggregates.
- Small sides of joins are broadcast-hinted; big aggregations rely on
  hash partial+final aggregation; top-k is ``orderBy().limit()`` so
  Spark plans ``TakeOrderedAndProject``.
"""

from project_2_semantic_similarity_spark.session import get_spark


def __getattr__(name):
    # lazy: avoid importing the full operator surface at package import
    if name in ("Engine", "Corpus"):
        from project_2_semantic_similarity_spark import engine
        return getattr(engine, name)
    raise AttributeError(name)


__all__ = ["get_spark", "Engine", "Corpus"]
