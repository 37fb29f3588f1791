"""Tests for text_unigram_train (Kudo 2018 §4 EM trainer): a pure-
Python replication of the whole pipeline (seed → EM round → prune →
final E-step) checked row-for-row, plus the invariants the recipe
guarantees (characters never pruned, multi-char cap, rank is a
permutation, integer-cost grid margin)."""

from __future__ import annotations

import math

import pytest

from project_2_semantic_similarity_spark.operators.text import (
    unigram_viterbi_word,
)
from project_2_semantic_similarity_spark.plans.q_textlab import (
    UNI_SEED_K,
    UNI_SEED_MAX_LEN,
    UNI_VOCAB_K,
    text_unigram_train,
)


def _py_train(docs: list[str]):
    """Pure-Python mirror of the trainer (the Viterbi core is the
    independently-pinned unigram_viterbi_word)."""
    wf: dict[str, int] = {}
    for txt in docs:
        for w in txt.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    # seed: substring occurrences up to UNI_SEED_MAX_LEN, wf-weighted
    seedf: dict[str, int] = {}
    for w, f in wf.items():
        for ln in range(1, min(UNI_SEED_MAX_LEN, len(w)) + 1):
            for s in range(len(w) - ln + 1):
                p = w[s:s + ln]
                seedf[p] = seedf.get(p, 0) + f
    chars = {p: f for p, f in seedf.items() if len(p) == 1}
    multi = sorted(((p, f) for p, f in seedf.items() if len(p) > 1),
                   key=lambda t: (-t[1], t[0]))[:UNI_SEED_K]
    seed = dict(chars)
    seed.update(dict(multi))

    def costs_of(freqs: dict[str, int]) -> dict[str, int]:
        tot = float(sum(freqs.values()))
        return {p: int(-math.floor(1e6 * math.log(f / tot)))
                for p, f in freqs.items()}

    c1 = costs_of(seed)
    u1 = max(c1.values()) + 1_000_000
    f2: dict[str, int] = {}
    for w, f in wf.items():
        toks, _ = unigram_viterbi_word(w, c1, u1)
        for t in toks:
            f2[t] = f2.get(t, 0) + f
    kept_multi = sorted(((p, f) for p, f in f2.items() if len(p) > 1),
                        key=lambda t: (-t[1], t[0]))[:UNI_VOCAB_K]
    kept = {p: f2.get(p, 0) + 1 for p in chars}
    kept.update({p: f + 1 for p, f in kept_multi})
    is_char = {p: (1 if len(p) == 1 else 0) for p in kept}
    c2 = costs_of(kept)
    u2 = max(c2.values()) + 1_000_000
    ff: dict[str, int] = {}
    for w, f in wf.items():
        toks, _ = unigram_viterbi_word(w, c2, u2)
        for t in toks:
            ff[t] = ff.get(t, 0) + f
    rows = [(p, is_char[p], ff.get(p, 0), c2[p]) for p in kept]
    rows.sort(key=lambda t: (-t[2], t[0]))
    return [(p, ic, fq, c, i + 1) for i, (p, ic, fq, c)
            in enumerate(rows)]


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    return text_unigram_train(spark, sf_dir).collect()


def test_unigram_train_matches_python_oracle(spark, sf_dir, trained):
    docs = [r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()]
    expect = _py_train(docs)
    got = sorted(
        ((r.piece, r.is_char, r.freq, r.cost_micro_nats, r.vocab_rank)
         for r in trained), key=lambda t: t[4])
    assert got == expect


def test_unigram_train_invariants(spark, sf_dir, trained):
    pieces = {r.piece for r in trained}
    # every character of every corpus word survives pruning
    alphabet = set()
    for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet").select("text").collect():
        for w in r.text.split(" "):
            alphabet.update(w)
    assert alphabet <= pieces
    n_multi = sum(1 for r in trained if r.is_char == 0)
    assert 0 < n_multi <= UNI_VOCAB_K
    ranks = sorted(r.vocab_rank for r in trained)
    assert ranks == list(range(1, len(trained) + 1))
    for r in trained:
        assert isinstance(r.cost_micro_nats, int)
        assert r.cost_micro_nats > 0
        assert r.is_char == (1 if len(r.piece) == 1 else 0)
