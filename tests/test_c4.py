"""Tests for text_c4_filters: the synthetic corpus has no sentence
punctuation (the declared query covers the degenerate path), so the
punctuated-path behavior — every published rule plus the
three-sentence-span dedup — is pinned here by driving constructed
fixtures through the IDENTICAL plan (c4_page_features) against a
pure-Python mirror."""

from __future__ import annotations

import re

import pytest

from project_2_semantic_similarity_spark.plans.q_quality import (
    C4_BADWORDS,
    C4_MIN_LINE_WORDS,
    C4_MIN_SENTENCES,
    c4_page_features,
)

_FIXTURE = [
    # (doc_id, lang, text)
    (1, "en", "The quick brown fox jumps over the lazy dog.\n"
              "Hello world.\n"
              "No terminal punctuation here at all"),
    (2, "en", "Alpha beta gamma delta one. Alpha beta gamma delta "
              "two! Alpha beta gamma delta three?"),
    (3, "en", "Alpha beta gamma delta one. Alpha beta gamma delta "
              "two! Alpha beta gamma delta three?"),
    (4, "en", "This javascript line is long enough to pass."),
    (5, "en", "lorem ipsum dolor sit amet here. Second sentence is "
              "long enough. A third sentence is right here too."),
    (6, "de", "Viele gute Saetze stehen hier drin. Noch ein ganzer "
              "Satz folgt sofort. Und hier kommt der dritte Satz."),
    (7, "en", "function foo() { return bar; } plus words. Second "
              "sentence is long enough. A third sentence stands "
              "right here."),
    (8, "en", "This page mentions xxx in plain words. Second "
              "sentence is long enough. A third sentence stands "
              "right here."),
]


def _py_c4(rows):
    feats = {}
    spans = []  # (sk, doc_id, pos)
    for doc_id, lang, text in rows:
        lines = [l for l in text.split("\n") if l.strip()]
        kept = []
        for l in lines:
            t = l.strip()
            words = [w for w in re.split(r"\s+", t) if w]
            if (re.search(r'[.!?"]$', t)
                    and len(words) >= C4_MIN_LINE_WORDS
                    and "javascript" not in re.split(r"\s+",
                                                     l.lower())):
                kept.append(l)
        joined = " ".join(kept)
        sents = [re.sub(r"\s+", " ", s.lower()).strip()
                 for s in re.findall(r"[^.!?]*[.!?]+", joined)]
        sents = [s for s in sents if s]
        lt = text.lower()
        bad = any(w in C4_BADWORDS for w in re.split(r"\s+", lt))
        feats[doc_id] = dict(
            n_lines=len(lines), n_kept_lines=len(kept),
            n_sentences=len(sents),
            has_lorem=int("lorem ipsum" in lt),
            has_brace=int("{" in lt), has_badword=int(bad),
            is_en=int(lang == "en"))
        for pos in range(max(len(sents) - 2, 0)):
            spans.append(("\x1f".join(sents[pos:pos + 3]),
                          doc_id, pos))
    firsts = {}
    dup_counts = {d: 0 for d, _, _ in rows}
    for sk, doc_id, pos in sorted(spans,
                                  key=lambda t: (t[0], t[1], t[2])):
        if sk in firsts:
            dup_counts[doc_id] += 1
        else:
            firsts[sk] = (doc_id, pos)
    for d, f in feats.items():
        f["n_dup_spans"] = dup_counts[d]
        f["keep"] = int(f["n_sentences"] >= C4_MIN_SENTENCES
                        and not f["has_lorem"] and not f["has_brace"]
                        and not f["has_badword"] and f["is_en"])
    return feats


@pytest.fixture(scope="module")
def c4_rows(spark):
    df = spark.createDataFrame(_FIXTURE,
                               "doc_id long, lang string, text string")
    return {r.doc_id: r for r in c4_page_features(df).collect()}


def test_c4_matches_python_mirror(c4_rows):
    expect = _py_c4(_FIXTURE)
    assert set(c4_rows) == set(expect)
    for d, e in expect.items():
        g = c4_rows[d]
        for k, v in e.items():
            assert getattr(g, k) == v, (d, k, getattr(g, k), v)


def test_c4_rule_by_rule(c4_rows):
    # d1: only the fox line survives (short + unpunctuated dropped)
    assert (c4_rows[1].n_kept_lines, c4_rows[1].n_sentences,
            c4_rows[1].keep) == (1, 1, 0)
    # d2 keeps; d3 is an exact span duplicate of d2 (later doc_id)
    assert c4_rows[2].keep == 1 and c4_rows[2].n_dup_spans == 0
    assert c4_rows[3].keep == 1 and c4_rows[3].n_dup_spans == 1
    # javascript line removed entirely
    assert c4_rows[4].n_kept_lines == 0
    # page-level drops: lorem / lang / brace / badword
    assert c4_rows[5].has_lorem == 1 and c4_rows[5].keep == 0
    assert c4_rows[6].is_en == 0 and c4_rows[6].keep == 0
    assert c4_rows[7].has_brace == 1 and c4_rows[7].keep == 0
    assert c4_rows[8].has_badword == 1 and c4_rows[8].keep == 0


def test_c4_degenerate_corpus(spark, sf_dir):
    """On the unpunctuated synthetic corpus every page fails the
    line filter — the declared query's documented degenerate path."""
    from project_2_semantic_similarity_spark.plans.q_quality import (
        text_c4_filters)

    rows = text_c4_filters(spark, sf_dir).collect()
    assert rows and all(r.n_kept_lines == 0 and r.keep == 0
                        for r in rows)
    assert any(r.is_en == 1 for r in rows)
    assert any(r.is_en == 0 for r in rows)


def test_c4_stream_is_batch_flags_twin(spark, sf_dir):
    """stream_c4_filters (availableNow replay) must equal the batch
    stateless flags on the same documents — the stream/batch twin
    contract; and on every page the full pipeline's keep equals the
    flags keep (span dedup never gates keep, per the paper)."""
    from project_2_semantic_similarity_spark.plans.q_quality import (
        c4_page_flags, text_c4_filters)
    from project_2_semantic_similarity_spark.plans.q_streaming import (
        stream_c4_filters)

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "text"))
    batch = {r.doc_id: r for r in c4_page_flags(docs).collect()}
    stream = {r.doc_id: r for r in
              stream_c4_filters(spark, sf_dir).collect()}
    assert set(batch) == set(stream)
    for d, b in batch.items():
        assert tuple(b) == tuple(stream[d])
    full = {r.doc_id: r.keep for r in
            text_c4_filters(spark, sf_dir).collect()}
    assert all(full[d] == b.keep for d, b in batch.items())


def test_c4_flags_match_full_pipeline_on_fixture(spark):
    """c4_page_flags and c4_page_features agree on every shared
    column for the punctuated fixture (the refactor's seam)."""
    from project_2_semantic_similarity_spark.plans.q_quality import (
        c4_page_flags, c4_page_features)

    df = spark.createDataFrame(_FIXTURE,
                               "doc_id long, lang string, text string")
    flags = {r.doc_id: r for r in c4_page_flags(df).collect()}
    full = {r.doc_id: r for r in c4_page_features(df).collect()}
    shared = ["n_lines", "n_kept_lines", "n_sentences", "has_lorem",
              "has_brace", "has_badword", "is_en", "keep"]
    for d in full:
        for c in shared:
            assert getattr(flags[d], c) == getattr(full[d], c)
