"""Text-analysis functions for training-data pipelines: language ID
(stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.

Every function here is a pure Column expression (JVM codegen, no
Python UDFs) so the same logic can be replicated verbatim in the
DuckDB oracles. The heuristics are deliberately simple, deterministic
stand-ins for real models (fastText lang-id, learned quality
classifiers) — the Spark-side plumbing is the deliverable."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists; hit-ratio argmax decides.
LANG_STOPWORDS = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}

# BPE-ish subword chunks: greedy runs of ≤4 letters, digits, or a
# single non-space symbol — a deterministic stand-in for a real BPE.
BPE_ISH_PATTERN = "[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\\s]"

_FP_PRIME = 2_147_483_647  # mod keeps the rolling hash in int32 range


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _hits(text: Column, words: tuple[str, ...]) -> Column:
    toks = _tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword hit counts per language."""
    return {lang: _hits(text, words)
            for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """argmax of stopword hits, priority en > de > fr on ties,
    'unknown' when nothing matches."""
    s = lang_scores(text)
    return (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0), "unknown")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )


def n_tokens(text: Column) -> Column:
    return F.size(F.filter(_tokens(text), lambda t: t != "")).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish subword chunks (regexp-driven)."""
    # idx=0 = whole match (Spark defaults to group 1, which needs a
    # capture group; DuckDB defaults to 0)
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)) \
        .cast("bigint")


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: length, mean token length,
    alpha ratio, digit ratio, stopword(en) ratio."""
    nt = n_tokens(text)
    n_chars = F.length(text).cast("bigint")
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": nt,
        "mean_token_len": F.try_divide(
            F.length(F.regexp_replace(text, r"\s+", "")), nt),
        "alpha_ratio": F.try_divide(alpha, n_chars),
        "digit_ratio": F.try_divide(digit, n_chars),
        "stopword_ratio": F.try_divide(_hits(text, LANG_STOPWORDS["en"]), nt),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score: rewards mid-length docs with high
    alpha ratio and some stopwords; penalizes digit soup. A linear
    stand-in for a learned classifier."""
    q = quality_features(text)
    length_term = F.least(q["n_tokens"] / F.lit(50.0), F.lit(1.0))
    return (
        0.4 * length_term
        + 0.3 * F.coalesce(q["alpha_ratio"], F.lit(0.0))
        + 0.2 * F.least(F.coalesce(q["stopword_ratio"], F.lit(0.0))
                        * 5.0, F.lit(1.0))
        - 0.1 * F.coalesce(q["digit_ratio"], F.lit(0.0))
    )


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized,
    lowercased text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def fingerprint_rolling(text: Column) -> Column:
    """Polynomial rolling hash over the normalized character stream:
    acc = (acc * 31 + ascii(ch)) mod (2^31 - 1). Computed with the
    `aggregate` higher-order function — stays in codegen, and the
    mod at every step keeps the accumulator overflow-free under ANSI
    mode."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(_FP_PRIME)),
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repetition, \b only.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{4}\b"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))
         .cast("bigint"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0))
         .cast("bigint"),
    )


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholders —
    the standard pre-training scrub, pure JVM regexp (no Python in
    the row path)."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN, "<PHONE>")
