"""Published-recipe corpus-quality query family (SURVEY.md §2.B
"training-data pipeline" north star): the Gopher rule filter
(Rae et al. 2021, MassiveText, Appendix A), interpolated Kneser-Ney
bigram scoring (Kneser & Ney 1995; Chen & Goodman 1998), CCNet-style
perplexity bucketing (Wenzek et al. 2020), DSIR hashed-n-gram
importance weights (Xie et al. 2023), and a FineWeb-style composed
prep pipeline (Penedo et al. 2024). Every rule is a pure Column
expression or hash equi-join replicated verbatim in the DuckDB
oracles — no RNG, no Python in the row path.

Reference parity note: the reference engine (app.py:1-187) has no
quality-filtering surface at all; this family is part of the
"beyond the reference" training-data mandate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.functions import text_analysis as TA
from project_2_semantic_similarity_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from project_2_semantic_similarity_spark.plans import q_textlab as QT
from project_2_semantic_similarity_spark.plans.registry import ORACLES, query
from project_2_semantic_similarity_spark.sources import load_table

# ---------------------------------------------------------------- gopher

# The published MassiveText/Gopher document-rule constants
# (Rae et al. 2021 Appendix A). Kept as named module constants so the
# oracles, the Spark plan, and the tests all read the same numbers.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_REQ_STOPWORDS = 2
# The paper's required-stopword set.
GOPHER_REQ_STOPWORDS = ("the", "be", "to", "of", "and", "that",
                        "have", "with")

_REQ_SQL = ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)

_GOPHER_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t <> '') AS tk,
           list_filter(string_split(text, chr(10)),
                       l -> trim(l) <> '') AS lines,
           text
    FROM documents
),
feat AS (
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_words,
           coalesce(list_sum(list_transform(tk, t -> length(t))), 0)
               / CAST(nullif(len(tk), 0) AS DOUBLE) AS mwl,
           ((length(text) - length(regexp_replace(text, '#', '', 'g')))
            + (length(text)
               - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3)
               / CAST(nullif(len(tk), 0) AS DOUBLE) AS symr,
           len(list_filter(lines,
                   l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%'
                        OR trim(l) LIKE '•%'))
               / CAST(nullif(len(lines), 0) AS DOUBLE) AS bulf,
           len(list_filter(lines, l -> trim(l) LIKE '%...'))
               / CAST(nullif(len(lines), 0) AS DOUBLE) AS ellf,
           len(list_filter(tk, t -> regexp_matches(t, '[a-zA-Z]')))
               / CAST(nullif(len(tk), 0) AS DOUBLE) AS alpf,
           CAST(len(list_filter([{_REQ_SQL}],
                                w -> list_contains(tk, w)))
                AS BIGINT) AS n_req_stop
    FROM toks
),
flags AS (
    SELECT doc_id, n_words,
           round(coalesce(mwl, 0.0), 6) AS mean_word_len,
           round(coalesce(symr, 0.0), 6) AS symbol_ratio,
           round(coalesce(bulf, 0.0), 6) AS bullet_frac,
           round(coalesce(ellf, 0.0), 6) AS ellipsis_frac,
           round(coalesce(alpf, 0.0), 6) AS alpha_frac,
           n_req_stop,
           CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS}
                                 AND {GOPHER_MAX_WORDS}
                THEN 1 ELSE 0 END AS r_words,
           CASE WHEN coalesce(mwl, 0.0)
                     BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                         AND {GOPHER_MAX_MEAN_WORD_LEN}
                THEN 1 ELSE 0 END AS r_word_len,
           CASE WHEN coalesce(symr, 0.0) <= {GOPHER_MAX_SYMBOL_RATIO}
                THEN 1 ELSE 0 END AS r_symbols,
           CASE WHEN coalesce(bulf, 0.0) <= {GOPHER_MAX_BULLET_FRAC}
                THEN 1 ELSE 0 END AS r_bullets,
           CASE WHEN coalesce(ellf, 0.0) <= {GOPHER_MAX_ELLIPSIS_FRAC}
                THEN 1 ELSE 0 END AS r_ellipsis,
           CASE WHEN coalesce(alpf, 0.0) >= {GOPHER_MIN_ALPHA_FRAC}
                THEN 1 ELSE 0 END AS r_alpha,
           CASE WHEN n_req_stop >= {GOPHER_MIN_REQ_STOPWORDS}
                THEN 1 ELSE 0 END AS r_stopwords
    FROM feat
)
SELECT *,
       r_words * r_word_len * r_symbols * r_bullets * r_ellipsis
           * r_alpha * r_stopwords AS keep,
       r_words * r_word_len * r_symbols * r_bullets * r_ellipsis
           * r_alpha AS keep_no_stopword_rule
FROM flags
"""


def _gopher_flags(text):
    """The Gopher rule features as Column expressions over a text
    column — one narrow codegen'd map, replicated verbatim in
    _GOPHER_SQL. Returns a dict of named Columns."""
    tk = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    lines = F.filter(F.split(text, "\n"), lambda s: F.trim(s) != "")
    n_words = F.size(tk).cast("bigint")
    nwd = F.nullif(F.size(tk), F.lit(0)).cast("double")
    nld = F.nullif(F.size(lines), F.lit(0)).cast("double")
    sum_len = F.coalesce(
        F.aggregate(tk, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)),
        F.lit(0).cast("bigint"))
    hashes = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    ellipses = (F.length(text)
                - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    bullets = F.size(F.filter(
        lines,
        lambda s: F.trim(s).startswith("-") | F.trim(s).startswith("*")
        | F.trim(s).startswith("•")))
    ell_lines = F.size(F.filter(lines,
                                lambda s: F.trim(s).endswith("...")))
    alpha_words = F.size(F.filter(tk, lambda t: t.rlike("[a-zA-Z]")))
    req = F.array(*[F.lit(w) for w in GOPHER_REQ_STOPWORDS])
    n_req = F.size(F.filter(req,
                            lambda w: F.array_contains(tk, w))
                   ).cast("bigint")
    return {
        "n_words": n_words,
        "mean_word_len": F.coalesce(sum_len / nwd, F.lit(0.0)),
        "symbol_ratio": F.coalesce((hashes + ellipses) / nwd, F.lit(0.0)),
        "bullet_frac": F.coalesce(bullets / nld, F.lit(0.0)),
        "ellipsis_frac": F.coalesce(ell_lines / nld, F.lit(0.0)),
        "alpha_frac": F.coalesce(alpha_words / nwd, F.lit(0.0)),
        "n_req_stop": n_req,
    }


def gopher_rule_columns(text):
    """(feature dict, rule dict, keep, keep_no_stopword_rule) — the
    full published rule set as 0/1 Columns. The stopword-free variant
    exists because real rule sets are corpus-dependent: the synthetic
    bench corpus contains none of the paper's required stopwords, so
    the published keep is the constant 0 there (still asserted by the
    oracle) while keep_no_stopword_rule splits it ~50/50 on the
    word-count bound — the branch the filter tests exercise."""
    f = _gopher_flags(text)
    rules = {
        "r_words": (f["n_words"] >= GOPHER_MIN_WORDS)
        & (f["n_words"] <= GOPHER_MAX_WORDS),
        "r_word_len": (f["mean_word_len"] >= GOPHER_MIN_MEAN_WORD_LEN)
        & (f["mean_word_len"] <= GOPHER_MAX_MEAN_WORD_LEN),
        "r_symbols": f["symbol_ratio"] <= GOPHER_MAX_SYMBOL_RATIO,
        "r_bullets": f["bullet_frac"] <= GOPHER_MAX_BULLET_FRAC,
        "r_ellipsis": f["ellipsis_frac"] <= GOPHER_MAX_ELLIPSIS_FRAC,
        "r_alpha": f["alpha_frac"] >= GOPHER_MIN_ALPHA_FRAC,
        "r_stopwords": f["n_req_stop"] >= GOPHER_MIN_REQ_STOPWORDS,
    }
    ri = {k: v.cast("int") for k, v in rules.items()}
    keep = ri["r_words"] * ri["r_word_len"] * ri["r_symbols"] \
        * ri["r_bullets"] * ri["r_ellipsis"] * ri["r_alpha"] \
        * ri["r_stopwords"]
    keep_relaxed = ri["r_words"] * ri["r_word_len"] * ri["r_symbols"] \
        * ri["r_bullets"] * ri["r_ellipsis"] * ri["r_alpha"]
    return f, ri, keep, keep_relaxed


@query("text_gopher_rules", oracle=_GOPHER_SQL)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText document-quality rules (Rae et al. 2021
    Appendix A) per document: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio ('#' and '...'), bullet-line and
    ellipsis-line fractions, alphabetic-word fraction, and the
    required-stopword count — each published threshold as a 0/1 rule
    column plus the conjunctive keep flag (and the stopword-free
    variant; see gopher_rule_columns on why both are declared).

    Scale: one narrow whole-stage-codegen'd map over the text column
    — zero shuffle, zero Python; at 100 TB this is the filter that
    pushes into the scan and decides which rows ever get tokenized."""
    d = load_table(spark, sf_dir, "documents")
    f, ri, keep, keep_relaxed = gopher_rule_columns(F.col("text"))
    return d.select(
        "doc_id",
        f["n_words"].alias("n_words"),
        F.round(f["mean_word_len"], 6).alias("mean_word_len"),
        F.round(f["symbol_ratio"], 6).alias("symbol_ratio"),
        F.round(f["bullet_frac"], 6).alias("bullet_frac"),
        F.round(f["ellipsis_frac"], 6).alias("ellipsis_frac"),
        F.round(f["alpha_frac"], 6).alias("alpha_frac"),
        f["n_req_stop"].alias("n_req_stop"),
        *[ri[k].alias(k) for k in
          ("r_words", "r_word_len", "r_symbols", "r_bullets",
           "r_ellipsis", "r_alpha", "r_stopwords")],
        keep.alias("keep"),
        keep_relaxed.alias("keep_no_stopword_rule"),
    )


# ------------------------------------------------------------ kneser-ney

_KN_D = 0.75  # the standard absolute-discount constant

_KN_SQL = f"""
WITH corpus AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
tok AS (
    SELECT doc_id,
           CAST(generate_subscripts(string_split_regex(text, '\\s+'), 1)
                AS BIGINT) AS pos,
           unnest(string_split_regex(text, '\\s+')) AS term
    FROM corpus
),
tok2 AS (SELECT doc_id, pos, term FROM tok WHERE term <> ''),
big AS (
    SELECT doc_id, term AS w1,
           lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok2
),
big2 AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
bcnt AS (SELECT w1, w2, count(*) AS bc FROM big2 GROUP BY w1, w2),
ucnt AS (SELECT w1, count(*) AS uc FROM big2 GROUP BY w1),
types AS (SELECT DISTINCT w1, w2 FROM big2),
nf AS (SELECT w1, count(*) AS n1f FROM types GROUP BY w1),
nb AS (SELECT w2, count(*) AS n1b FROM types GROUP BY w2),
bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM types)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(
           (c.bc - {_KN_D}) / u.uc
           + {_KN_D} * f.n1f / u.uc * (k.n1b / t.b)
       )), 6) AS kn_xent
FROM big2 g
JOIN bcnt c ON c.w1 = g.w1 AND c.w2 = g.w2
JOIN ucnt u ON u.w1 = g.w1
JOIN nf f ON f.w1 = g.w1
JOIN nb k ON k.w2 = g.w2
CROSS JOIN bt t
GROUP BY g.doc_id
"""


@query("text_lm_kneser_ney", oracle=_KN_SQL)
def text_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per document
    (Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.28, absolute
    discount d=0.75): P(w2|w1) = max(c(w1w2)-d,0)/c(w1·)
    + d·N1+(w1·)/c(w1·) · Pcont(w2), with the continuation
    probability Pcont(w2) = N1+(·w2)/|bigram types| — the smoothing
    every production n-gram LM pipeline (e.g. KenLM) actually uses,
    upgrading text_perplexity_bigram's add-k stand-in. Trained and
    scored on the same corpus, so every scored bigram has c ≥ 1 and
    the discounted term stays positive.

    Scale: bigrams form in one per-doc window (shares the doc_id
    shuffle); the four count relations are map-side-combinable hash
    aggs joined back on w1/w2 equi-keys — all Heaps'-law-sized, so
    none carries a broadcast hint (AQE decides, the r12 policy);
    |types| is a 1-row broadcast. Token-volume linear end to end."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split("text", r"\s+")).alias("pos", "term"))
        .filter(F.col("term") != ""))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (tok.select("doc_id", F.col("term").alias("w1"),
                      F.lead("term").over(w).alias("w2"))
           .filter(F.col("w2").isNotNull()))
    bcnt = big.groupBy("w1", "w2").agg(F.count("*").alias("bc"))
    ucnt = big.groupBy("w1").agg(F.count("*").alias("uc"))
    types = big.select("w1", "w2").distinct()
    nf = types.groupBy("w1").agg(F.count("*").alias("n1f"))
    nb = types.groupBy("w2").agg(F.count("*").alias("n1b"))
    bt = types.agg(F.count("*").cast("double").alias("b"))
    p = ((F.col("bc") - _KN_D) / F.col("uc")
         + _KN_D * F.col("n1f") / F.col("uc")
         * (F.col("n1b") / F.col("b")))
    return (big.join(bcnt, ["w1", "w2"])
            .join(ucnt, ["w1"])
            .join(nf, ["w1"])
            .join(nb, ["w2"])
            .crossJoin(F.broadcast(bt))
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                 F.round(F.avg(-F.log(p)), 6).alias("kn_xent")))


# ------------------------------------------------------------------ dsir

_DSIR_B = 256  # 2-hex-char md5 prefix → 256 buckets, both engines

_DSIR_SQL = f"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest(list_filter(
               string_split_regex(trim(text), '\\s+'),
               t -> t <> '')) AS term
    FROM documents
),
bk AS (
    SELECT doc_id, lang,
           substr(md5('dsir:' || term), 1, 2) AS b
    FROM tok
),
cr AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM bk GROUP BY b),
ct AS (SELECT b, CAST(count(*) AS DOUBLE) AS ct FROM bk
       WHERE lang = 'en' GROUP BY b),
dim AS (
    SELECT cr.b, cr.cr, coalesce(ct.ct, 0.0) AS ct
    FROM cr LEFT JOIN ct ON ct.b = cr.b
),
tots AS (SELECT sum(cr) AS r, sum(ct) AS t FROM dim),
lr AS (
    SELECT b,
           ln((ct + 1.0) / (t + {_DSIR_B}.0))
           - ln((cr + 1.0) / (r + {_DSIR_B}.0)) AS logratio
    FROM dim CROSS JOIN tots
)
SELECT k.doc_id, k.lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(l.logratio), 6) AS dsir_logw
FROM bk k JOIN lr l ON l.b = k.b
GROUP BY k.doc_id, k.lang
"""


@query("corpus_dsir_weights", oracle=_DSIR_SQL)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-unigram
    bag-of-ngrams importance of each document for a TARGET
    distribution — here target = the lang='en' slice, raw = the whole
    corpus. Each token hashes to one of 256 buckets via the portable
    md5 prefix (the sampling family's RNG-free discipline); the
    per-bucket log-ratio log(p_target/p_raw) uses add-1 smoothing;
    a document's weight is the sum of its tokens' bucket log-ratios.
    Downstream, sampling ∝ exp(weight) is importance resampling —
    the paper's recipe for skewing a 100 TB crawl toward a target
    domain without a learned classifier.

    Scale: token → bucket is a narrow md5 map; both count relations
    are 256-row hash aggs; the bucket dimension is BOUNDED at 256
    rows by construction, so its broadcast is the pinned
    entity-dimension design (not a Heaps'-law hint — the r12
    unhinting policy distinguishes exactly this case). One shuffle
    for the final per-doc agg. Token-volume linear."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select(
        "doc_id", "lang",
        F.explode(F.array_remove(
            F.split(F.trim(F.col("text")), r"\s+"), "")).alias("term")))
    bk = tok.select(
        "doc_id", "lang",
        F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("term"))),
                    1, 2).alias("b"))
    cr = bk.groupBy("b").agg(F.count("*").cast("double").alias("cr"))
    ct = (bk.filter(F.col("lang") == "en")
          .groupBy("b").agg(F.count("*").cast("double").alias("ct")))
    dim = (cr.join(ct, "b", "left")
           .select("b", "cr", F.coalesce(F.col("ct"), F.lit(0.0))
                   .alias("ct")))
    tots = dim.agg(F.sum("cr").alias("r"), F.sum("ct").alias("t"))
    lr = (dim.crossJoin(F.broadcast(tots))
          .select("b",
                  (F.log((F.col("ct") + 1.0) / (F.col("t") + _DSIR_B))
                   - F.log((F.col("cr") + 1.0)
                           / (F.col("r") + _DSIR_B))).alias("logratio")))
    return (bk.join(F.broadcast(lr), "b")
            .groupBy("doc_id", "lang")
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.round(F.sum("logratio"), 6).alias("dsir_logw")))


# ----------------------------------------------------------------- ccnet

def _ccnet_oracle() -> str:
    # The perplexity model is text_perplexity_bigram's, verbatim —
    # its registered oracle embeds as a CTE body (a full SELECT may
    # itself start with WITH).
    return f"""
WITH px AS ({ORACLES['text_perplexity_bigram']}),
j AS (
    SELECT p.doc_id, d.lang, p.bigram_xent
    FROM px p
    JOIN (SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang
          FROM documents) d ON d.doc_id = p.doc_id
),
nt AS (
    SELECT doc_id, lang, bigram_xent,
           ntile(3) OVER (PARTITION BY lang
                          ORDER BY bigram_xent, doc_id) AS tert
    FROM j
)
SELECT doc_id, lang, bigram_xent,
       CASE tert WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM nt
"""


@query("text_ccnet_buckets", oracle=_ccnet_oracle())
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus bigram LM
    (text_perplexity_bigram, reused as-is), then split each language
    into head / middle / tail perplexity tertiles — the quality
    strata CCNet publishes and pretraining mixes sample from.

    Scale: the tertile is NOT a per-language window (5 langs → 5
    reducers would serialize a 100 TB sort): documents range-partition
    on (lang, xent, doc_id) via the with_global_rank machinery, and
    the per-language tertile falls out of the global rank minus a
    broadcast per-language offset, fed through the closed-form ANSI
    ntile arithmetic (ntile_from_rank) — identical output to the
    window, cluster-wide parallelism instead of |langs| reducers."""
    px = QT.text_perplexity_bigram(spark, sf_dir)
    docs = (load_table(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    "lang"))
    j = px.join(docs, "doc_id").select("doc_id", "lang", "bigram_xent")
    ranked = with_global_rank(
        j, [F.col("lang"), F.col("bigram_xent"), F.col("doc_id")],
        rank_col="_rn")
    lc = j.groupBy("lang").agg(F.count("*").alias("_cnt"))
    # |langs| rows: metadata-sized single-partition window (the same
    # exemption rank.py itself uses for its offset table).
    woff = Window.orderBy("lang").rowsBetween(
        Window.unboundedPreceding, -1)
    offs = lc.select(
        "lang", F.col("_cnt"),
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"))
    tert = ntile_from_rank(
        F.col("_rn") - F.col("_off"), F.col("_cnt"), 3)
    return (ranked.join(F.broadcast(offs), "lang")
            .select("doc_id", "lang", "bigram_xent",
                    F.when(tert == 1, "head")
                    .when(tert == 2, "middle")
                    .otherwise("tail").alias("bucket")))


# --------------------------------------------------------------- fineweb

_FW_MIN_JACCARD = 0.5


def _fineweb_oracle() -> str:
    hits = QT._hits_sql
    en, de, fr = QT._EN, QT._DE, QT._FR
    return f"""
WITH scored AS (
    SELECT doc_id, text,
           {hits(en)} AS s_en,
           {hits(de)} AS s_de,
           {hits(fr)} AS s_fr
    FROM documents
),
langed AS (
    SELECT doc_id, text FROM scored
    WHERE NOT (s_en = 0 AND s_de = 0 AND s_fr = 0)
      AND s_en >= s_de AND s_en >= s_fr
),
toks AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t <> '') AS tk,
           list_filter(string_split(text, chr(10)),
                       l -> trim(l) <> '') AS lines
    FROM langed
),
gop AS (
    SELECT doc_id, text, CAST(len(tk) AS BIGINT) AS n_words
    FROM toks
    WHERE len(tk) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
      AND coalesce(list_sum(list_transform(tk, t -> length(t)))
                   / CAST(nullif(len(tk), 0) AS DOUBLE), 0.0)
          BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
              AND {GOPHER_MAX_MEAN_WORD_LEN}
      AND coalesce(((length(text)
                     - length(regexp_replace(text, '#', '', 'g')))
                    + (length(text)
                       - length(regexp_replace(
                             text, '\\.\\.\\.', '', 'g'))) / 3)
                   / CAST(nullif(len(tk), 0) AS DOUBLE), 0.0)
          <= {GOPHER_MAX_SYMBOL_RATIO}
      AND coalesce(len(list_filter(lines,
                       l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%'
                            OR trim(l) LIKE '•%'))
                   / CAST(nullif(len(lines), 0) AS DOUBLE), 0.0)
          <= {GOPHER_MAX_BULLET_FRAC}
      AND coalesce(len(list_filter(lines, l -> trim(l) LIKE '%...'))
                   / CAST(nullif(len(lines), 0) AS DOUBLE), 0.0)
          <= {GOPHER_MAX_ELLIPSIS_FRAC}
      AND coalesce(len(list_filter(tk,
                       t -> regexp_matches(t, '[a-zA-Z]')))
                   / CAST(nullif(len(tk), 0) AS DOUBLE), 0.0)
          >= {GOPHER_MIN_ALPHA_FRAC}
),
hashed AS (
    SELECT doc_id,
           sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS content_hash
    FROM gop
),
exact_loser AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY content_hash
                                  ORDER BY doc_id) AS rn
        FROM hashed
    ) WHERE rn > 1
),
tok AS (
    SELECT doc_id,
           CAST(generate_subscripts(string_split_regex(text, '\\s+'), 1)
                AS BIGINT) AS pos,
           unnest(string_split_regex(text, '\\s+')) AS term
    FROM gop
),
seq AS (
    SELECT doc_id, pos, term,
           lead(term, 1) OVER w AS t1,
           lead(term, 2) OVER w AS t2
    FROM tok WHERE term <> ''
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (
    SELECT DISTINCT doc_id, term || ' ' || t1 || ' ' || t2 AS shingle
    FROM seq WHERE t2 IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
near_loser AS (
    SELECT DISTINCT i.doc_b AS doc_id
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_inter / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE)
          >= {_FW_MIN_JACCARD}
)
SELECT g.doc_id, g.n_words
FROM gop g
WHERE g.doc_id NOT IN (SELECT doc_id FROM exact_loser)
  AND g.doc_id NOT IN (SELECT doc_id FROM near_loser)
"""


@query("corpus_prep_fineweb", oracle=_fineweb_oracle())
def corpus_prep_fineweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style composed prep pipeline (Penedo et al. 2024;
    same skeleton as RefinedWeb): language ID gate (predicted 'en',
    the stopword-hit classifier of text_lang_id) → Gopher rule filter
    (the published thresholds minus the required-stopword rule —
    gopher_rule_columns documents why on this corpus) → exact dedup
    (sha256 of normalized text, lowest doc_id wins) → near-dup
    suppression (3-shingle Jaccard ≥ 0.5, higher id dropped) →
    surviving (doc_id, n_words). The FineWeb finding this encodes:
    filtering ORDER matters — dedup runs on the filtered slice, so
    its join volume is already a fraction of the crawl.

    Scale: lang + Gopher gates are narrow codegen'd maps that push
    into the scan; dedup stages are hash equi-joins; at 100 TB the
    near-dup stage swaps the all-co-shingled verify for minhash-LSH
    discovery + candidate-restricted verify exactly as
    corpus_prep_pipeline_lsh does (same operators, pinned equal on
    fixtures)."""
    from project_2_semantic_similarity_spark.operators import dedup as D
    from project_2_semantic_similarity_spark.operators.cache import (
        keyed_persist)
    from project_2_semantic_similarity_spark.sources.tables import (
        source_fingerprint)

    docs = load_table(spark, sf_dir, "documents")

    def build_gop():
        langed = docs.filter(TA.lang_id(F.col("text")) == "en")
        _f, _ri, _keep, keep_relaxed = gopher_rule_columns(F.col("text"))
        return (langed.withColumn("_keep", keep_relaxed)
                .filter(F.col("_keep") == 1)
                .select("doc_id", "text",
                        _gopher_flags(F.col("text"))["n_words"]
                        .alias("n_words")))

    # the filtered slice feeds FOUR plan branches (shingle self-join
    # sides, exact dedup, the survivor join-back) — unpersisted, the
    # lang+Gopher codegen map over the corpus executed once per
    # branch per run (r14 A/B below); the slot is the prep_kept
    # discipline, keyed on the source fingerprint
    gop = keyed_persist(
        "fineweb_gop", (sf_dir, source_fingerprint(sf_dir, "documents")),
        build_gop)
    exact_winners = D.exact_dedup(gop.select("doc_id", "text")) \
        .select("doc_id")
    near_losers = (
        D.jaccard_pairs(D.shingles(gop.select("doc_id", "text")),
                        _FW_MIN_JACCARD)
        .select(F.col("doc_b").alias("doc_id")).distinct())
    return (gop.select("doc_id", "n_words")
            .join(exact_winners, "doc_id", "left_semi")
            .join(near_losers, "doc_id", "left_anti"))


# ---------------------------------------------------------------- c4

# The published C4 cleaning constants (Raffel et al. 2020 §2.2).
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# Stand-in slice of the "List of Dirty, Naughty, Obscene..." word
# list the paper filters with (the list itself is a third-party
# artifact; the match mechanics are what the engine implements).
C4_BADWORDS = ("porn", "xxx", "nsfw")

_C4_BAD_SQL = ", ".join(f"'{w}'" for w in C4_BADWORDS)


def _c4_keep_col():
    """The conjunctive C4 page keep (spans do not gate it — the
    paper dedups spans but never drops a page for them)."""
    return F.when(
        (F.col("n_sentences") >= C4_MIN_SENTENCES)
        & (F.col("has_lorem") == 0) & (F.col("has_brace") == 0)
        & (F.col("has_badword") == 0) & (F.col("is_en") == 1),
        1).otherwise(0)


def _c4_feat(docs: DataFrame) -> DataFrame:
    """Per-page C4 feature frame (doc_id, line counts, kept-line
    sentences, page flags) — one STATELESS narrow Column map shared
    by the batch query, the streaming twin and the fixture tests."""
    ls = F.filter(F.split(F.col("text"), "\n"),
                  lambda l: F.trim(l) != F.lit(""))
    kept = F.filter(ls, lambda l: (
        F.trim(l).rlike('[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"),
                           lambda w: w != F.lit("")))
           >= C4_MIN_LINE_WORDS)
        & ~F.array_contains(F.split(F.lower(l), r"\s+"), "javascript")))
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.concat_ws(" ", kept),
                                 F.lit('[^.!?]*[.!?]+'), F.lit(0)),
            lambda s: F.trim(F.regexp_replace(F.lower(s),
                                              F.lit(r"\s+"),
                                              F.lit(" ")))),
        lambda s: s != F.lit(""))
    lt = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(ls).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        sents.alias("sents"),
        F.when(lt.contains("lorem ipsum"), 1).otherwise(0)
         .alias("has_lorem"),
        F.when(lt.contains("{"), 1).otherwise(0).alias("has_brace"),
        F.when(F.size(F.filter(
            F.split(lt, r"\s+"),
            lambda w: w.isin(*C4_BADWORDS))) > 0, 1).otherwise(0)
         .alias("has_badword"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )


def c4_page_flags(docs: DataFrame) -> DataFrame:
    """The STATELESS subset of the C4 pipeline — every per-page rule
    and the conjunctive keep, no corpus-wide span state. This is the
    plan the streaming twin runs (a pure projection: no watermark, no
    state store, no shuffle)."""
    return (_c4_feat(docs)
            .select("doc_id", "n_lines", "n_kept_lines",
                    F.size("sents").cast("long").alias("n_sentences"),
                    "has_lorem", "has_brace", "has_badword", "is_en")
            .withColumn("keep", _c4_keep_col()))


def c4_spans(feat: DataFrame) -> DataFrame:
    """Every 3-sentence span of a C4 feature frame as
    (doc_id, pos, sk) with the md5 span key — the exploded relation
    BOTH the batch window dedup and the streaming TTL'd
    first-occurrence state consume (shared text, so the stream twin
    can't drift from the batch span definition)."""
    return (feat
            .select("doc_id", "sents",
                    F.explode(F.when(
                        F.size("sents") >= 3,
                        F.sequence(F.lit(0), F.size("sents") - 3))
                        .otherwise(F.array().cast("array<int>")))
                     .alias("pos"))
            .select("doc_id", F.col("pos").cast("long").alias("pos"),
                    F.md5(F.concat_ws(
                        "\x1f",
                        F.element_at("sents", F.col("pos") + 1),
                        F.element_at("sents", F.col("pos") + 2),
                        F.element_at("sents", F.col("pos") + 3)))
                     .alias("sk")))


def c4_page_features(docs: DataFrame) -> DataFrame:
    """The FULL C4 page pipeline over any (doc_id, lang, text) frame
    — line filtering (terminal punctuation, ≥5 words, no
    'javascript'), sentence extraction over the KEPT lines, page
    flags (lorem ipsum, curly brace, bad words, language), corpus-wide
    three-sentence-span duplicate counting, and the conjunctive keep.
    Split out from the declared query so tests can drive punctuated
    fixtures through the identical plan."""
    # sents reused by two branches (spans + count) — pin the exchange
    feat = _c4_feat(docs).localCheckpoint()
    spans = c4_spans(feat)
    w = Window.partitionBy("sk").orderBy("doc_id", "pos")
    dups = (spans.withColumn("rn", F.row_number().over(w))
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                  .cast("long").alias("n_dup")))
    out = (feat.join(dups, "doc_id", "left")
           .select("doc_id", "n_lines", "n_kept_lines",
                   F.size("sents").cast("long").alias("n_sentences"),
                   F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
                    .alias("n_dup_spans"),
                   "has_lorem", "has_brace", "has_badword", "is_en"))
    return out.withColumn("keep", _c4_keep_col())


# Shared oracle CTE prefix (lines → line filter → page features):
# the batch oracle appends the span-dedup stage; the streaming twin's
# oracle selects the stateless flags directly — stream/batch
# equivalence by SHARED TEXT (the SURVEY §5 twin discipline).
_C4_FEAT_SQL = f"""
lines AS (
    SELECT doc_id, lang, text, lower(text) AS lt,
           list_filter(string_split(text, chr(10)),
                       l -> trim(l) <> '') AS ls
    FROM documents
),
flt AS (
    SELECT doc_id, lang, lt,
           CAST(len(ls) AS BIGINT) AS n_lines,
           list_filter(ls, l ->
               regexp_matches(trim(l), '[.!?"]$')
               AND len(list_filter(string_split_regex(trim(l), '\\s+'),
                                   w -> w <> '')) >= {C4_MIN_LINE_WORDS}
               AND NOT list_contains(
                       string_split_regex(lower(l), '\\s+'),
                       'javascript')) AS kept
    FROM lines
),
feat AS MATERIALIZED (
    SELECT doc_id, n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           list_filter(list_transform(
               -- array_to_string([]) is NULL in DuckDB; Spark's
               -- concat_ws gives '' — coalesce for parity
               regexp_extract_all(coalesce(array_to_string(kept, ' '),
                                           ''),
                                  '[^.!?]*[.!?]+'),
               s -> trim(regexp_replace(lower(s), '\\s+', ' ', 'g'))),
               s -> s <> '') AS sents,
           CASE WHEN contains(lt, 'lorem ipsum') THEN 1 ELSE 0 END
               AS has_lorem,
           CASE WHEN contains(lt, '{{') THEN 1 ELSE 0 END AS has_brace,
           CASE WHEN len(list_filter(string_split_regex(lt, '\\s+'),
                                     w -> w IN ({_C4_BAD_SQL}))) > 0
                THEN 1 ELSE 0 END AS has_badword,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
    FROM flt
)"""

# The keep rule as SQL — shared by both oracles verbatim.
_C4_KEEP_SQL = f"""CASE WHEN len(f.sents) >= {C4_MIN_SENTENCES}
                 AND f.has_lorem = 0 AND f.has_brace = 0
                 AND f.has_badword = 0 AND f.is_en = 1
            THEN 1 ELSE 0 END AS keep"""


@query(
    "text_c4_filters",
    oracle=f"""
WITH {_C4_FEAT_SQL},
spans AS (
    SELECT doc_id, CAST(i.n AS BIGINT) AS pos,
           md5(sents[CAST(i.n + 1 AS INT)] || chr(31)
               || sents[CAST(i.n + 2 AS INT)] || chr(31)
               || sents[CAST(i.n + 3 AS INT)]) AS sk
    FROM feat, unnest(range(greatest(len(sents) - 2, 0))) AS i(n)
),
marked AS (
    SELECT doc_id,
           row_number() OVER (PARTITION BY sk
                              ORDER BY doc_id, pos) AS rn
    FROM spans
),
dups AS (
    SELECT doc_id,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dup
    FROM marked GROUP BY doc_id
)
SELECT f.doc_id, f.n_lines, f.n_kept_lines,
       CAST(len(f.sents) AS BIGINT) AS n_sentences,
       coalesce(d.n_dup, 0) AS n_dup_spans,
       f.has_lorem, f.has_brace, f.has_badword, f.is_en,
       {_C4_KEEP_SQL}
FROM feat f LEFT JOIN dups d USING (doc_id)
""",
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning recipe (Raffel et al. 2020 §2.2, the corpus
    behind T5) — the remaining canonical published pipeline beside
    Gopher/CCNet/FineWeb: per-LINE retention (ends in terminal
    punctuation, ≥5 words, no 'javascript'), page rules (≥3
    sentences over the kept lines, no 'lorem ipsum', no '{{', no
    listed bad word, English page — the stored lang label stands in
    for the paper's langdetect ≥ 0.99), and the corpus-wide
    THREE-SENTENCE-SPAN duplicate count (the paper removes all but
    the first occurrence; this emits the per-page duplicate-span
    count plus the conjunctive keep).

    Corpus note: the synthetic documents have no sentence
    punctuation, so every page fails the line filter here (n_kept
    = 0) and the differential check exercises the full machinery on
    the degenerate path; the punctuated-path behavior is pinned by
    tests/test_c4.py fixtures through the IDENTICAL plan
    (c4_page_features — the multimodal-codec fixture discipline).

    100 TB shape: everything except the span count is a narrow
    codegen'd Column map (higher-order array functions — no UDF, no
    shuffle); the span stage shuffles md5 span keys once (uniform
    keys, no skew) for a partitioned — never global — first-occurrence
    window, exactly the dedup_passage shape."""
    d = load_table(spark, sf_dir, "documents")
    return c4_page_features(d.select("doc_id", "lang", "text"))
