"""UDF / UDAF / UDTF query surface (SURVEY.md §2.B "UDF surface").

Each query has the same semantics as a built-in composition, so the
DuckDB oracles are shared shapes with q_text — these demonstrate the
Python-extension path (row UDF / Arrow-vectorized pandas UDF /
grouped-map applyInPandas / UDTF), not new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.operators import text as T
from project_2_semantic_similarity_spark.operators.udfs import (
    normalize_term_arrow_udf,
    normalize_term_udf,
    term_norms_applyinpandas,
    tfidf_pandas_udf,
)
from project_2_semantic_similarity_spark.plans.q_text import _corpus, _TFIDF_CTES
from project_2_semantic_similarity_spark.plans.registry import query
from project_2_semantic_similarity_spark.sources import load_table


@query(
    "udf_python",
    oracle="""
WITH corpus AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
tok AS (
    SELECT DISTINCT unnest(string_split_regex(text, '\\s+')) AS term
    FROM corpus
)
SELECT term,
       lower(trim(trim('  ' || upper(term) || '!! '),
                  '.,;:!?"''()[]{}')) AS norm_term
FROM tok WHERE term <> ''
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: normalize a deliberately-dirtied
    term (pad + upper + punctuation) back to canonical form."""
    terms = T.tokenize(_corpus(spark, sf_dir)).select("term").distinct()
    dirty = F.concat(F.lit("  "), F.upper("term"), F.lit("!! "))
    return terms.select("term", normalize_term_udf(dirty).alias("norm_term"))


@query(
    "udf_arrow",
    oracle="""
WITH tok AS (
    SELECT DISTINCT unnest(string_split_regex(text, '\\s+')) AS term
    FROM documents
)
SELECT term,
       lower(trim(trim('  ' || upper(term) || '!! '),
                  '.,;:!?"''()[]{}')) AS norm_term
FROM tok WHERE term <> ''
""",
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (useArrow=True): identical
    semantics to udf_python with Arrow-batched serialization — the
    drop-in upgrade when legacy row UDFs can't become pandas_udfs."""
    terms = T.tokenize(_corpus(spark, sf_dir)).select("term").distinct()
    dirty = F.concat(F.lit("  "), F.upper("term"), F.lit("!! "))
    return terms.select(
        "term", normalize_term_arrow_udf(dirty).alias("norm_term"))


@query(
    "udf_pandas",
    oracle=f"""
WITH {_TFIDF_CTES}
SELECT doc_id, term, round(tfidf, 6) AS tfidf FROM tfidf
""",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF computing the TF-IDF scalar —
    identical results to the built-in text_tfidf (shared oracle)."""
    corpus = _corpus(spark, sf_dir)
    n_docs = corpus.agg(F.count("*").alias("n_docs"))
    scored = (
        T.with_doc_frequency(T.with_doc_length(
            T.term_counts(T.tokenize(corpus))))
        .crossJoin(F.broadcast(n_docs))
    )
    return scored.select(
        "doc_id", "term",
        F.round(
            tfidf_pandas_udf(
                F.col("tf_count").cast("double"),
                F.col("doc_len").cast("double"),
                F.col("n_docs").cast("double"),
                F.col("df").cast("double"),
            ), 6,
        ).alias("tfidf"),
    )


@query(
    "udaf_pandas",
    oracle=f"""
WITH {_TFIDF_CTES}
SELECT term, round(sqrt(sum(tfidf * tfidf)), 6) AS norm
FROM tfidf GROUP BY term
""",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF (applyInPandas): per-term L2 norm of the
    tf-idf document vector."""
    norms = term_norms_applyinpandas(T.tfidf(_corpus(spark, sf_dir)))
    return norms.select("term", F.round("norm", 6).alias("norm"))


@query(
    "udtf_python",
    oracle="""
WITH corpus AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
tok AS (
    SELECT doc_id,
           CAST(generate_subscripts(string_split_regex(text, '\\s+'), 1) - 1
                AS BIGINT) AS pos,
           unnest(string_split_regex(text, '\\s+')) AS term
    FROM corpus
)
SELECT doc_id, pos, term FROM tok WHERE term <> ''
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5): tokenizer emitting (pos, term) rows
    via LATERAL join — same output as text_tokenize."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, term string")
    class TokenizeUDTF:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split()):
                yield i, tok

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    _corpus(spark, sf_dir).createOrReplaceTempView("udtf_corpus")
    return spark.sql("""
        SELECT c.doc_id, t.pos, t.term
        FROM udtf_corpus c, LATERAL tokenize_udtf(c.text) t
    """)


@query(
    "udf_batch_inference",
    oracle="""
WITH w AS (
    SELECT list_transform(generate_series(0, 63),
                          i -> 1.0 / (1 + CAST(i AS DOUBLE))) AS wv
),
scored AS (
    SELECT e.vec_id,
           list_dot_product(e.embedding::DOUBLE[], w.wv) AS logit
    FROM embeddings e, w
)
SELECT vec_id,
       round(1.0 / (1.0 + exp(-logit)), 6) AS score,
       CASE WHEN 1.0 / (1.0 + exp(-logit)) >= 0.5
            THEN 1 ELSE 0 END AS keep
FROM scored
""",
)
def udf_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH MODEL INFERENCE over Arrow — the shape of model-based
    quality filtering at 100 TB (a classifier scores every document/
    embedding; the pipeline keeps survivors): mapInPandas receives
    Arrow record batches, runs one VECTORIZED numpy matvec per batch
    (batch_rows × dim @ dim — this is where a real ONNX/torch
    forward pass plugs in), and emits (id, score, keep). The
    'model' is a fixed harmonic-weight logistic head so the oracle
    can replay the same inference in SQL — the plumbing (Arrow
    batching, batch-level vectorization, schema contract, narrow
    zero-shuffle stage) is exactly what a real checkpoint uses;
    weights would broadcast the same way.

    exp/sigmoid agree bit-for-bit across engines per IEEE libm
    conventions at round-6; the dot product folds in index order on
    both sides."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    dim = 64
    weights = 1.0 / (1.0 + np.arange(dim, dtype=np.float64))

    def infer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64)
                 for v in pdf["embedding"]])
            logit = mat @ weights
            score = 1.0 / (1.0 + np.exp(-logit))
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "score": np.round(score, 6),
                "keep": (score >= 0.5).astype("int32"),
            })

    return e.select("vec_id", "embedding").mapInPandas(
        infer, schema="vec_id bigint, score double, keep int")
