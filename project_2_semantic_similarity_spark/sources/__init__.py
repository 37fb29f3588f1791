"""Sources: parquet table loader, reference-format text corpus reader,
CSV/JSON readers with explicit schemas, parquet sink.
"""

from project_2_semantic_similarity_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    register_views,
)
from project_2_semantic_similarity_spark.sources.text_corpus import (
    corpus_from_documents,
    read_text_corpus,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "register_views",
    "read_text_corpus",
    "corpus_from_documents",
]
