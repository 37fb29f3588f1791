"""Tests for corpus_epoch_mix: budget conservation in expectation,
the floor/floor+1 copy rule, both mix directions present (epochs > 1
on tail sources, subsample < 1 on head sources), and the md5-uniform
margin that makes the cross-engine float comparison safe."""

from __future__ import annotations

import hashlib

import pytest

from project_2_semantic_similarity_spark.plans.q_sampling import (
    EPOCH_MIX_ALPHA,
    corpus_epoch_mix,
)


@pytest.fixture(scope="module")
def mixed(spark, sf_dir):
    return corpus_epoch_mix(spark, sf_dir).collect()


def test_epoch_mix_python_oracle(spark, sf_dir, mixed):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok = {r.doc_id: len([t for t in r.text.split() if t])
           for r in docs}
    src = {r.doc_id: r.source for r in docs}
    tok_s: dict[str, int] = {}
    for d, s in src.items():
        tok_s[s] = tok_s.get(s, 0) + tok[d]
    sw = sum(v ** EPOCH_MIX_ALPHA for v in tok_s.values())
    total = float(sum(tok_s.values()))
    rpt = {s: (total * (v ** EPOCH_MIX_ALPHA) / sw) / v
           for s, v in tok_s.items()}
    got = {r.doc_id: r for r in mixed}
    assert set(got) == set(tok)
    for d, r in got.items():
        rp = rpt[src[d]]
        assert r.n_tokens == tok[d]
        assert r.repeat_factor == pytest.approx(rp, abs=1e-6)
        u = int(hashlib.md5(f"epoch:{d}".encode()).hexdigest()[:4],
                16) / 65536.0
        # threshold on the 1e-6-quantized repeat factor (r12 ADVICE:
        # the unrounded frac(rpt) involves pow()/float sums that can
        # differ by ulps between engines; the quantized grid is what
        # the emitted repeat_factor uses)
        rp_q = round(rp, 6)
        expect_copies = int(rp) + (1 if u < rp_q - int(rp) else 0)
        assert r.n_copies == expect_copies


def test_epoch_mix_budget_and_directions(mixed):
    # expected emitted tokens == budget (grand total), by construction
    emitted = sum(r.n_tokens * r.repeat_factor for r in mixed)
    total = sum(r.n_tokens for r in mixed)
    assert emitted == pytest.approx(total, rel=1e-4)
    # α < 1 must move mass both ways on a non-degenerate corpus
    assert any(r.repeat_factor > 1.0 for r in mixed)
    assert any(r.repeat_factor < 1.0 for r in mixed)
    for r in mixed:
        low = int(r.repeat_factor)
        assert r.n_copies in (low, low + 1)


def test_epoch_mix_md5_margin(mixed):
    """The Bernoulli compare u < frac(repeat) must not sit within
    float noise of equality for any doc — the cross-engine
    determinism evidence (both engines compute repeat from exact
    integer token sums, so only a knife-edge tie could flip)."""
    for r in mixed:
        u = int(hashlib.md5(f"epoch:{r.doc_id}".encode())
                .hexdigest()[:4], 16) / 65536.0
        frac = r.repeat_factor - int(r.repeat_factor)
        assert abs(u - frac) > 1e-7
