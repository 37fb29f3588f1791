"""Tests for the published-recipe corpus-quality family
(plans/q_quality.py): Gopher rules, Kneser-Ney bigram scoring,
CCNet perplexity buckets, DSIR importance weights, and the composed
FineWeb-style prep pipeline — each pinned against a brute-force
pure-Python oracle on constructed fixtures, plus invariants the
published recipes guarantee (KN normalization, ntile balance,
permutation-freeness of the md5 bucketing)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_quality import (
    GOPHER_MIN_REQ_STOPWORDS,
    GOPHER_MIN_WORDS,
    _KN_D,
    corpus_dsir_weights,
    corpus_prep_fineweb,
    gopher_rule_columns,
    text_ccnet_buckets,
    text_gopher_rules,
    text_lm_kneser_ney,
)


def _flags(spark, text):
    """Run gopher_rule_columns over a single text value, return the
    rule dict as a plain {name: 0/1} row."""
    df = spark.createDataFrame([(text,)], ["text"])
    _f, ri, keep, keep_rel = gopher_rule_columns(F.col("text"))
    row = df.select(
        *[v.alias(k) for k, v in ri.items()],
        keep.alias("keep"), keep_rel.alias("keep_rel")).first()
    return row.asDict()


GOOD = ("the project is large and it was built to work with care "
        "that much is true of good text " * 5)  # >50 words, stopwords


def test_gopher_good_doc_passes(spark):
    r = _flags(spark, GOOD)
    assert r["keep"] == 1 and all(
        r[k] == 1 for k in ("r_words", "r_word_len", "r_symbols",
                            "r_bullets", "r_ellipsis", "r_alpha",
                            "r_stopwords"))


def test_gopher_each_rule_fires(spark):
    # one mutation per rule, everything else held passing
    assert _flags(spark, "short text the of")["r_words"] == 0
    long_words = " ".join(["antidisestablishment"] * 60) + " the of"
    assert _flags(spark, long_words)["r_word_len"] == 0
    hashed = GOOD + " " + " ".join(["#"] * 40)
    assert _flags(spark, hashed)["r_symbols"] == 0
    bullets = "\n".join(["- item " + GOOD] + ["- x"] * 20)
    assert _flags(spark, bullets)["r_bullets"] == 0
    ell = "\n".join([GOOD] + [f"cut line {i}..." for i in range(9)])
    assert _flags(spark, ell)["r_ellipsis"] == 0
    nums = GOOD + " " + " ".join(["12345"] * 200)
    assert _flags(spark, nums)["r_alpha"] == 0
    nostop = " ".join(f"word{i}" for i in range(60))
    r = _flags(spark, nostop)
    assert r["r_stopwords"] == 0 and r["keep"] == 0 \
        and r["keep_rel"] == 1  # the relaxed flag ignores stopwords


def test_gopher_driver_query_shape(spark, sf_dir):
    out = text_gopher_rules(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["keep"] in (0, 1)
        # published-keep implies relaxed-keep (strict subset rule)
        assert r["keep"] <= r["keep_no_stopword_rule"]
        # the synthetic corpus contains no required stopwords
        assert r["n_req_stop"] < GOPHER_MIN_REQ_STOPWORDS
    kept = sum(r["keep_no_stopword_rule"] for r in rows)
    assert 0 < kept < len(rows)  # the relaxed gate actually splits


# ------------------------------------------------------------ kneser-ney

def _kn_bruteforce(texts):
    """Pure-python interpolated-KN per-doc xent, the published
    formula verbatim."""
    docs = {i: t.split() for i, t in enumerate(texts)}
    bigr = [(w1, w2) for toks in docs.values()
            for w1, w2 in zip(toks, toks[1:])]
    from collections import Counter
    bc = Counter(bigr)
    uc = Counter(w1 for w1, _ in bigr)
    types = set(bigr)
    n1f = Counter(w1 for w1, _ in types)
    n1b = Counter(w2 for _, w2 in types)
    B = float(len(types))

    def p(w1, w2):
        return (max(bc[(w1, w2)] - _KN_D, 0.0) / uc[w1]
                + _KN_D * n1f[w1] / uc[w1] * (n1b[w2] / B))

    out = {}
    for i, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        if pairs:
            out[str(i)] = (len(pairs),
                           sum(-math.log(p(a, b)) for a, b in pairs)
                           / len(pairs))
    return out, p, uc, n1f, n1b, B


def test_kn_matches_bruteforce(spark, tmp_path):
    texts = ["a b a c a b", "b c b c d", "a a a a", "d e f g h a b"]
    sf = _write_docs(spark, tmp_path, [
        (i, t, "en", "t", len(t)) for i, t in enumerate(texts)])
    got = {r["doc_id"]: (r["n_bigrams"], r["kn_xent"])
           for r in text_lm_kneser_ney(spark, sf).collect()}
    want, *_ = _kn_bruteforce(texts)
    assert set(got) == set(want)
    for k, (n, x) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(round(x, 6), abs=2e-6)


def test_kn_distribution_normalizes(spark):
    # interpolated KN must give sum_{w2 in types} P(w2|w1) == 1 for
    # every context w1 — the property add-k smoothing only gets by
    # construction and backoff schemes routinely break.
    texts = ["a b a c a b d", "b c b c d a", "x y x z y a b"]
    _, p, uc, n1f, n1b, B = _kn_bruteforce(texts)
    w2s = set(n1b)
    for w1 in uc:
        tot = sum(p(w1, w2) for w2 in w2s)
        assert tot == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------------------ dsir

def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_dsir_matches_bruteforce(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma alpha", "en", "t", 10),
        (1, "alpha beta delta", "en", "t", 10),
        (2, "omega psi chi omega psi", "de", "t", 10),
        (3, "alpha omega beta psi", "fr", "t", 10),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: (r["n_tokens"], r["dsir_logw"])
           for r in corpus_dsir_weights(spark, sf).collect()}

    def bucket(t):
        return hashlib.md5(f"dsir:{t}".encode()).hexdigest()[:2]

    from collections import Counter
    cr, ct = Counter(), Counter()
    for _i, text, lang, *_ in rows:
        for t in text.split():
            cr[bucket(t)] += 1
            if lang == "en":
                ct[bucket(t)] += 1
    R, T = sum(cr.values()), sum(ct.values())

    def lr(b):
        return (math.log((ct.get(b, 0) + 1.0) / (T + 256.0))
                - math.log((cr[b] + 1.0) / (R + 256.0)))

    for i, text, *_ in rows:
        toks = text.split()
        want = sum(lr(bucket(t)) for t in toks)
        assert got[i][0] == len(toks)
        assert got[i][1] == pytest.approx(round(want, 6), abs=2e-6)
    # docs made of target-only tokens outweigh target-absent ones
    assert got[0][1] > got[2][1]


# ----------------------------------------------------------------- ccnet

def test_ccnet_buckets_balanced_and_ordered(spark, sf_dir):
    rows = text_ccnet_buckets(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((r["bucket"], r["bigram_xent"]))
    for lang, items in by_lang.items():
        from collections import Counter
        sizes = Counter(b for b, _ in items)
        assert set(sizes) <= {"head", "middle", "tail"}
        if len(items) >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1
            h = max(x for b, x in items if b == "head")
            m = [x for b, x in items if b == "middle"]
            t = min(x for b, x in items if b == "tail")
            assert h <= min(m) and max(m) <= t


# --------------------------------------------------------------- fineweb

def test_fineweb_pipeline_stages(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "it runs far away to find more of the fine text " * 3)
    near = base + " extra"
    german = ("der hund und die katze das ist nicht ein gutes "
              "beispiel aber es geht " * 4)
    rows = [
        (0, base, "en", "t", len(base)),        # survivor
        (1, base, "en", "t", len(base)),        # exact dup -> dropped
        (2, near, "en", "t", len(near)),        # near dup -> dropped
        (3, "short the of and", "en", "t", 10),  # gopher wc -> dropped
        (4, german, "de", "t", len(german)),     # lang gate -> dropped
    ]
    sf = _write_docs(spark, tmp_path, rows)
    kept = {r["doc_id"]: r["n_words"]
            for r in corpus_prep_fineweb(spark, sf).collect()}
    assert set(kept) == {0}
    assert kept[0] >= GOPHER_MIN_WORDS
