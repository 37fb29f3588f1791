"""Deterministic sampling / splitting query family (SURVEY.md §2.B
"training-data pipeline" north star): portable-hash train/val/test
splits and stratified corpus rebalancing. Every decision is
md5-threshold based (operators/sampling.py), so the DuckDB oracles
replicate the arithmetic verbatim — no RNG, no engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.operators.sampling import (
    CTX_WINDOW,
    hash_split,
    hex_threshold,
    pack_shards,
    stratified_sample,
    temperature_sample,
)
from project_2_semantic_similarity_spark.plans.q_textlab import (
    corpus_prep_pipeline,
)
from project_2_semantic_similarity_spark.plans.registry import query
from project_2_semantic_similarity_spark.sources import load_table

# Shared split spec: 80/10/10 — the fractions every split-related
# test and oracle below pins.
_SPLIT = {"train": 0.8, "val": 0.1, "test": 0.1}

# Stratified rebalance: halve the dominant language, keep the rest.
_STRATA = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}


@query(
    "sample_hash_split",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{hex_threshold(0.8)}' THEN 'train'
            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{hex_threshold(0.9)}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test labeling of the corpus
    by md5 bucket (operators/sampling.py hash_split). Narrow map —
    zero shuffle; rerunning on any cluster layout, any partitioning,
    any engine yields the identical assignment, which is the
    leak-prevention property a split must have."""
    d = load_table(spark, sf_dir, "documents")
    return hash_split(d, "doc_id", _SPLIT).select("doc_id", "lang", "split")


@query(
    "sample_temperature",
    oracle="""
WITH counts AS (
    SELECT source, count(*) AS n_s FROM documents GROUP BY source
),
w AS (
    SELECT source, n_s,
           pow(CAST(n_s AS DOUBLE), 1.0 / 2.0) AS w
    FROM counts
),
tot AS (
    SELECT sum(w) AS sw, CAST(sum(n_s) AS DOUBLE) AS n FROM w
),
rates AS (
    SELECT w.source,
           least(1.0, 0.5 * t.n * w.w / (t.sw * w.n_s)) AS rate
    FROM w CROSS JOIN tot t
)
SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)),
                          1, 4) AS INTEGER) / 65536.0 < r.rate
""",
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2, target half the
    corpus): per-source keep rates ∝ √count, scaled to the budget and
    capped at 1 — up-weights tail sources relative to the head, the
    standard LLM-pretraining data-mix move
    (operators/sampling.py temperature_sample). Deterministic
    md5-threshold decisions; both engines compute the identical rate
    expression, so even the float comparison at the keep boundary
    agrees."""
    d = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(d, "source", temperature=2.0,
                              target_fraction=0.5, key="doc_id")
    return kept.select("doc_id", "source",
                       F.round("rate", 6).alias("rate"))


_SHARD_BUDGET = 2000  # tokens per shard; ~14 shards at sf0.01


@query(
    "corpus_pack_shards",
    oracle=f"""
WITH counted AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
total AS (
    SELECT greatest(1, CAST(ceil(CAST(sum(n_tokens) AS BIGINT)
                                 / {float(_SHARD_BUDGET)}) AS BIGINT))
               AS n_shards
    FROM counted
)
SELECT c.doc_id, c.n_tokens,
       CAST(floor(CAST('0x' || substr(md5('shard:' ||
                                          CAST(c.doc_id AS VARCHAR)), 1, 4)
                       AS INTEGER) * t.n_shards / 65536.0) AS BIGINT)
           AS shard_id
FROM counted c CROSS JOIN total t
""",
)
def corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding of the corpus (~2000 whitespace
    tokens per shard): one scalar aggregate for the shard count,
    broadcast back over a narrow hash-assignment map
    (operators/sampling.py pack_shards — docstring explains why this
    beats greedy packing's global prefix sum at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return pack_shards(d, _SHARD_BUDGET)


def _split_case_sql(key_sql: str) -> str:
    return f"""CASE WHEN substr(md5('split:' || {key_sql}), 1, 4)
                 < '{hex_threshold(0.8)}' THEN 'train'
            WHEN substr(md5('split:' || {key_sql}), 1, 4)
                 < '{hex_threshold(0.9)}' THEN 'val'
            ELSE 'test' END"""


def _shards_oracle() -> str:
    from project_2_semantic_similarity_spark.plans.q_textlab import (
        PREP_CTES)
    key = "CAST(s.doc_id AS VARCHAR)"
    return f"""
WITH {PREP_CTES},
total AS (
    SELECT greatest(1, CAST(ceil(CAST(sum(n_tokens) AS BIGINT)
                                 / {float(_SHARD_BUDGET)}) AS BIGINT))
               AS n_shards
    FROM survivor
),
labeled AS (
    SELECT s.doc_id, s.n_tokens,
           {_split_case_sql(key)} AS split,
           CAST(floor(CAST('0x' || substr(md5('shard:' || {key}), 1, 4)
                           AS INTEGER) * t.n_shards / 65536.0) AS BIGINT)
               AS shard_id
    FROM survivor s CROSS JOIN total t
)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM labeled GROUP BY 1, 2
"""


@query("corpus_to_training_shards", oracle=_shards_oracle())
def corpus_to_training_shards(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The full 100 TB story in one declared plan: quality gate →
    exact dedup → near-dup suppression (corpus_prep_pipeline) →
    deterministic train/val/test split (hash_split) → token-budget
    shard assignment (pack_shards) → the (split, shard) manifest a
    training job consumes. Every stage is a verified operator; the
    oracle reuses the prep pipeline's exact CTE chain (q_textlab
    PREP_CTES) so the two declarations cannot drift. At scale the
    output is `partitionBy(split, shard_id)` on the write — this
    manifest is its row-count/token accounting."""
    surv = corpus_prep_pipeline(spark, sf_dir).select("doc_id")
    docs = (load_table(spark, sf_dir, "documents")
            .join(surv, "doc_id", "left_semi"))
    split_df = hash_split(docs.select("doc_id"), "doc_id", _SPLIT) \
        .select("doc_id", "split")
    sharded = pack_shards(docs, _SHARD_BUDGET)
    return (
        sharded.join(split_df, "doc_id")
        .groupBy("split", "shard_id")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("n_tokens"))
    )


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE lang WHEN 'en' THEN '{hex_threshold(0.5)}'
                  WHEN 'de' THEN '{hex_threshold(1.0)}'
                  WHEN 'es' THEN '{hex_threshold(1.0)}'
                  WHEN 'fr' THEN '{hex_threshold(1.0)}'
                  WHEN 'zh' THEN '{hex_threshold(1.0)}'
                  ELSE '{hex_threshold(0.0)}' END
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified rebalance: keep 50% of 'en' (the dominant lang in
    the synthetic corpus), 100% of everything else — the
    language-mix correction pass. Per-stratum threshold is a CASE
    over literals, so this is the same narrow no-shuffle scan as
    sample_hash_split regardless of stratum skew (contrast the exact
    quota alternative, which needs a per-stratum global sort)."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        d, "lang", _STRATA, key="doc_id").select("doc_id", "lang")


@query(
    "sample_reservoir_weighted",
    oracle="""
WITH scored AS (
    SELECT doc_id,
           CAST(greatest(length(text), 1) AS DOUBLE) AS weight,
           ln( (('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT + 1.0)
               / 1152921504606846976.0 )
             / CAST(greatest(length(text), 1) AS DOUBLE) AS es_key
    FROM documents
),
topk AS (
    SELECT doc_id, weight, es_key FROM scored
    ORDER BY es_key DESC, doc_id LIMIT 200
)
SELECT doc_id, weight,
       CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT)
           AS rank
FROM topk
""",
)
def sample_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted 200-doc sample without replacement by the
    Efraimidis–Spirakis exponential-key method
    (operators/sampling.py weighted_sample_es), weight = document
    length in chars: the draw a mixture builder uses to over-sample
    long/high-value sources while staying fully deterministic — the
    key is ln(u)/w with u from the portable md5 of doc_id, so any
    engine reproduces the exact member set and order. Output is
    (doc_id, weight, rank); rank, not the raw key, so the driver
    hash never touches a transcendental's last ulp.

    Scale: narrow map to score, then TakeOrderedAndProject top-k —
    per-partition k-heaps merged on the driver, no global sort
    shuffle, O(k) driver memory. The final rank window runs on k
    rows (driver-sized by construction)."""
    from project_2_semantic_similarity_spark.operators.sampling import (
        weighted_sample_es)

    d = load_table(spark, sf_dir, "documents")
    sel = weighted_sample_es(
        d, "doc_id", F.greatest(F.length("text"), F.lit(1)), 200)
    w = Window.orderBy(F.col("es_key").desc(), "doc_id")
    return (
        sel.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "weight", "rank")
    )


@query(
    "sample_balanced_classes",
    oracle="""
WITH counts AS (
    SELECT lang, count(*) AS n FROM documents GROUP BY lang
),
cap AS (SELECT min(n) AS cap FROM counts),
ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS rn
    FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r, cap c
WHERE r.rn <= c.cap
""",
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language capped at the
    MINORITY class size, members chosen by seeded md5 rank within
    class — deterministic, engine-portable (the same RNG-free
    hash-threshold discipline as sample_hash_split, here as a
    hash-RANK because the quota is a count, not a rate). The
    standard rebalancing step before training on skewed corpora;
    re-runs on a grown corpus keep earlier picks only as their
    hash rank survives the cap (stable-prefix property of hash
    ordering).

    Scale: one count agg (map-side combinable), a 1-row cap
    broadcast, and one per-class window — partition-parallel across
    classes; for classes too large to sort, pre-filter by a hash
    THRESHOLD slightly above cap/|class| and rank only the
    survivors."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    cap = counts.agg(F.min("n").alias("cap"))
    ranked = docs.select(
        "doc_id", "lang",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.concat(F.lit("bal:"),
                               F.col("doc_id").cast("string"))),
                "doc_id")).alias("rn"))
    return (ranked.crossJoin(F.broadcast(cap))
            .filter(F.col("rn") <= F.col("cap"))
            .select("doc_id", "lang"))


# tokens per packed context window — hoisted to operators.sampling
# (shared with q_textlab without a plan-module circular import)
_CTX_WINDOW = CTX_WINDOW


@query(
    "corpus_pack_context_windows",
    oracle=f"""
WITH counted AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id) AS cum
    FROM counted
)
SELECT doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {_CTX_WINDOW} AS BIGINT) AS window_id,
       CAST((cum - n_tokens) % {_CTX_WINDOW} AS BIGINT) AS window_offset,
       CAST(CASE WHEN n_tokens = 0 THEN 0
                 ELSE (cum - 1) // {_CTX_WINDOW}
                      - (cum - n_tokens) // {_CTX_WINDOW} + 1 END
            AS BIGINT) AS n_windows_spanned
FROM c
""",
)
def corpus_pack_context_windows(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING — the canonical pretraining step the corpus
    family still lacked: concatenate the corpus into one token
    stream (deterministic doc_id order) and cut fixed
    512-token context windows; each document learns its global
    start offset, first window id, offset inside that window, and
    how many windows it spans (documents DO cross window boundaries,
    as in real packed pretraining batches).

    The global token offset is the textbook scale trap — a naive
    cumulative-sum window over the whole corpus is a
    single-partition sort. This reuses with_global_running_sum
    (operators/rank.py): range-partition by doc_id, per-partition
    running sums, and a BROADCAST metadata-sized offset table — one
    range shuffle total, the same machinery running_sum_probe pins
    at 5M rows. Integer token counts make the cumsum
    association-free, so the DuckDB oracle's sequential window sum
    lands bit-identically."""
    from project_2_semantic_similarity_spark.functions.text_analysis import (
        n_tokens)
    from project_2_semantic_similarity_spark.operators.rank import (
        with_global_running_sum)

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", n_tokens(F.col("text")).alias("n_tokens"))
    c = with_global_running_sum(
        counted, [F.col("doc_id").asc()], "n_tokens", sum_col="cum")
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id", "n_tokens",
        start.cast("long").alias("start_offset"),
        F.floor(start / _CTX_WINDOW).cast("long").alias("window_id"),
        (start % _CTX_WINDOW).cast("long").alias("window_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            F.floor((F.col("cum") - 1) / _CTX_WINDOW)
            - F.floor(start / _CTX_WINDOW) + 1
        ).cast("long").alias("n_windows_spanned"))


@query(
    "corpus_context_window_view",
    oracle=f"""
WITH counted AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id) AS cum
    FROM counted
),
spans AS (
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS strt,
           CAST(cum AS BIGINT) AS cum
    FROM c WHERE n_tokens > 0
)
SELECT CAST(t.w AS BIGINT) AS window_id, doc_id,
       CAST(greatest(strt, t.w * {_CTX_WINDOW}) - strt AS BIGINT)
           AS doc_slice_start,
       CAST(least(cum, (t.w + 1) * {_CTX_WINDOW})
            - greatest(strt, t.w * {_CTX_WINDOW}) AS BIGINT)
           AS slice_len,
       CAST(greatest(strt, t.w * {_CTX_WINDOW})
            - t.w * {_CTX_WINDOW} AS BIGINT) AS window_offset
FROM spans,
     unnest(generate_series(strt // {_CTX_WINDOW},
                            (cum - 1) // {_CTX_WINDOW})) AS t(w)
""",
)
def corpus_context_window_view(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The CONSUMER view of sequence packing (r9 VERDICT #6):
    corpus_pack_context_windows emits per-DOC window arithmetic;
    training loaders want the transpose — one row per (window_id,
    doc_id) slice assignment: which token span of the document
    lands at which offset of which fixed 512-token context window.
    Grouping this view by window_id reconstructs each training
    batch row exactly.

    Plan: the same with_global_running_sum relation (range
    partitions + broadcast offsets — NO new shuffle), then a BOUNDED
    explode of sequence(first_window, last_window) per document
    (a document spans ceil((offset + len)/W) - offset//W windows,
    ≤ len/W + 1 rows — never a cross join). Empty documents span no
    window and are filtered before the explode in both engines
    (Spark's sequence() would otherwise step DOWNWARD on the
    degenerate first>last case rather than yielding empty). At
    100 TB the output is ~(total_tokens / 512 + n_docs) rows,
    produced narrowly from the range-partitioned relation."""
    from project_2_semantic_similarity_spark.functions.text_analysis import (
        n_tokens)
    from project_2_semantic_similarity_spark.operators.rank import (
        with_global_running_sum)

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", n_tokens(F.col("text")).alias("n_tokens"))
    c = with_global_running_sum(
        counted, [F.col("doc_id").asc()], "n_tokens", sum_col="cum")
    W = F.lit(_CTX_WINDOW).cast("long")
    start = (F.col("cum") - F.col("n_tokens")).cast("long")
    spans = (c.filter(F.col("n_tokens") > 0)
             .select("doc_id", start.alias("strt"),
                     F.col("cum").cast("long").alias("cum")))
    w = F.explode(F.sequence(
        F.floor(F.col("strt") / W).cast("long"),
        F.floor((F.col("cum") - 1) / W).cast("long"))).alias("w")
    exploded = spans.select("doc_id", "strt", "cum", w)
    gs = F.greatest(F.col("strt"), F.col("w") * W)
    ge = F.least(F.col("cum"), (F.col("w") + 1) * W)
    return exploded.select(
        F.col("w").cast("long").alias("window_id"),
        "doc_id",
        (gs - F.col("strt")).cast("long").alias("doc_slice_start"),
        (ge - gs).cast("long").alias("slice_len"),
        (gs - F.col("w") * W).cast("long").alias("window_offset"))


# --------------------------------------------------- epoch mixing

# Weight exponent for the epoch mix: per-source target token share
# ∝ tokens^α (α < 1 flattens the head — the multilingual-sampling
# exponent of mC4/XLM-R, applied per SOURCE the way the LLaMA mix
# table up-samples small high-value sources to >1 epoch).
EPOCH_MIX_ALPHA = 0.5


@query(
    "corpus_epoch_mix",
    oracle=f"""
WITH counted AS (
    SELECT doc_id, source,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
per_src AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tok_s
    FROM counted GROUP BY source
),
w AS (
    SELECT source, tok_s,
           pow(CAST(tok_s AS DOUBLE), {EPOCH_MIX_ALPHA}) AS w
    FROM per_src
),
tot AS (
    SELECT sum(w) AS sw, CAST(sum(tok_s) AS DOUBLE) AS t FROM w
),
rates AS (
    SELECT source, (t.t * w.w / t.sw) / tok_s AS rpt
    FROM w CROSS JOIN tot t
)
SELECT c.doc_id, c.source, c.n_tokens,
       round(r.rpt, 6) AS repeat_factor,
       CAST(floor(r.rpt)
            + CASE WHEN CAST('0x' || substr(md5('epoch:'
                        || CAST(c.doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                        / 65536.0
                   < round(r.rpt, 6) - floor(r.rpt)
                   THEN 1 ELSE 0 END AS BIGINT) AS n_copies
FROM counted c JOIN rates r USING (source)
""",
)
def corpus_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget EPOCH mixing — the missing half of the data-mix
    surface: where sample_temperature SUBSAMPLES (rates capped at 1),
    this emits per-document REPEAT factors the way the published
    LLaMA mix runs small high-value sources for >1 epoch. Per-source
    target token share ∝ tokens^α at constant total budget (the
    grand token total), so head sources get repeat < 1 (subsample)
    and tail sources repeat > 1 (epochs); per doc,
    n_copies = floor(repeat) + Bernoulli(frac(repeat)) decided by the
    portable-md5 uniform — RNG-free, partitioning-immune, exactly
    reproducible across engines (the sample_hash_split discipline;
    the expected emitted token total equals the budget per source).

    100 TB shape: one map-side-combinable hash agg to per-source
    token totals (source is a BOUNDED entity dimension), a 1-row
    grand-total broadcast, and an AQE-decided join of the bounded
    rate relation back onto a narrow per-doc map — the corpus never
    shuffles and nothing data-sized is collected."""
    from project_2_semantic_similarity_spark.functions import (
        text_analysis as TA)
    from project_2_semantic_similarity_spark.operators.sampling import (
        _bucket)

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", "source",
                       TA.n_tokens(F.col("text")).alias("n_tokens"))
    per_src = counted.groupBy("source").agg(
        F.sum("n_tokens").alias("tok_s"))
    w = per_src.withColumn(
        "w", F.pow(F.col("tok_s").cast("double"),
                   F.lit(EPOCH_MIX_ALPHA)))
    tot = w.agg(F.sum("w").alias("sw"),
                F.sum("tok_s").cast("double").alias("t"))
    rates = (w.crossJoin(F.broadcast(tot))
             .select("source",
                     (F.col("t") * F.col("w") / F.col("sw")
                      / F.col("tok_s")).alias("rpt")))
    u = (F.conv(_bucket(F.col("doc_id"), "epoch"), 16, 10)
         .cast("long") / F.lit(65536.0))
    # Bernoulli threshold on the 1e-6-QUANTIZED repeat factor (r12
    # ADVICE): rpt involves pow() and float sums that can differ by
    # ulps between engines; comparing u against round(rpt,6)-floor(rpt)
    # puts the threshold on the same grid the emitted repeat_factor
    # already uses, so only a doc whose md5 uniform lands within 1e-6
    # of the quantized threshold could ever flip — and u's grid
    # (k/65536) never coincides with the 1e-6 grid at the margins
    # test_epoch_mix_md5_margin pins. (The floor(rpt) knife edge
    # self-heals: if engines disagree at an integer boundary, the
    # quantized frac becomes 1.0 on the low side — u < 1.0 always —
    # and 0.0 on the high side — u < 0.0 never — yielding the same
    # n_copies either way.)
    return (counted.join(rates, "source")
            .select("doc_id", "source", "n_tokens",
                    F.round("rpt", 6).alias("repeat_factor"),
                    (F.floor("rpt")
                     + F.when(u < F.round("rpt", 6) - F.floor("rpt"), 1)
                        .otherwise(0)).cast("long").alias("n_copies")))
