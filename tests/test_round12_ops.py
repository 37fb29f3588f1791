"""Tests for the round-12 additions: maximal duplicated-substring
runs (dedup_substring_runs), SemDeDup (dedup_semdedup), range
similarity search (knn_range_search), and manifest-based file
skipping (scan_manifest_pruned) — each pinned on constructed
fixtures against hand-computed expectations plus the invariants
the published recipes guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_dedup import (
    _RUNS_W,
    dedup_substring_runs,
)
from project_2_semantic_similarity_spark.plans.q_knn import (
    _RANGE_TAU,
    _SEMDEDUP_TAU,
    dedup_semdedup,
    knn_range_search,
)
from project_2_semantic_similarity_spark.plans.q_relational import (
    scan_manifest_pruned,
)


# ------------------------------------------------- substring runs

def _py_runs(texts: dict[int, str], w: int = _RUNS_W):
    """Pure-Python oracle: duplicated w-gram starts per doc,
    coalesced into islands with gap > w starting a new island."""
    toks = {d: [t for t in txt.split() if t] for d, txt in texts.items()}
    grams: dict[str, set[int]] = {}
    starts: dict[int, list[int]] = {}
    for d, tk in toks.items():
        for i in range(len(tk) - w + 1):
            g = " ".join(tk[i:i + w])
            grams.setdefault(g, set()).add(d)
    for d, tk in toks.items():
        pos = [i for i in range(len(tk) - w + 1)
               if len(grams[" ".join(tk[i:i + w])]) >= 2]
        starts[d] = pos
    out = {}
    for d, pos in starts.items():
        if not pos:
            continue
        islands = []
        s = e = pos[0]
        for p in pos[1:]:
            if p - e > w:
                islands.append((s, e))
                s = p
            e = p
        islands.append((s, e))
        covered = sum(b - a + w for a, b in islands)
        out[d] = dict(n_tokens=len(toks[d]), n_dup_kgrams=len(pos),
                      n_runs=len(islands), covered_tokens=covered,
                      longest_run=max(b - a + w for a, b in islands))
    return out


def test_substring_runs_matches_python_oracle(spark, sf_dir):
    rows = dedup_substring_runs(spark, sf_dir).collect()
    assert rows, "synthetic corpus must contain shared 8-gram runs"
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    expect = _py_runs(docs)
    got = {r.doc_id: r for r in rows}
    assert set(got) == set(expect)
    for d, e in expect.items():
        g = got[d]
        assert (g.n_tokens, g.n_dup_kgrams, g.n_runs,
                g.covered_tokens, g.longest_run) == (
            e["n_tokens"], e["n_dup_kgrams"], e["n_runs"],
            e["covered_tokens"], e["longest_run"])
        assert g.covered_frac == pytest.approx(
            e["covered_tokens"] / e["n_tokens"], abs=1e-6)


def test_substring_runs_invariants(spark, sf_dir):
    for r in dedup_substring_runs(spark, sf_dir).collect():
        # a run covers at least one whole window, never more than doc
        assert _RUNS_W <= r.longest_run <= r.covered_tokens
        assert r.covered_tokens <= r.n_tokens
        assert r.n_runs <= r.n_dup_kgrams


# ------------------------------------------------------- semdedup

@pytest.fixture(scope="module")
def semdedup_rows(spark, sf_dir):
    return dedup_semdedup(spark, sf_dir).collect()


def test_semdedup_drops_and_keeps(semdedup_rows):
    keeps = sum(r.keep for r in semdedup_rows)
    assert 0 < keeps < len(semdedup_rows), \
        "threshold must both drop and keep on the synthetic embeddings"


def test_semdedup_pair_exclusion_and_cluster_minimum(
        spark, sf_dir, semdedup_rows):
    """(1) No τ-duplicate pair survives with BOTH members kept;
    (2) each cluster's (ccos, vec_id)-minimum is always kept (it has
    no witness, by the keep-lowest-centroid-similarity rule)."""
    import numpy as np

    e = {r.vec_id: np.array(r.embedding, dtype=float) for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    by_cluster: dict[int, list] = {}
    for r in semdedup_rows:
        by_cluster.setdefault(r.list_id, []).append(r)
    for rows in by_cluster.values():
        lo = min(rows, key=lambda r: (r.ccos, r.vec_id))
        assert lo.keep == 1
        kept = [r for r in rows if r.keep == 1]
        for i, a in enumerate(kept):
            va = e[a.vec_id] / np.linalg.norm(e[a.vec_id])
            for b in kept[i + 1:]:
                vb = e[b.vec_id] / np.linalg.norm(e[b.vec_id])
                assert float(va @ vb) < _SEMDEDUP_TAU + 1e-9


# --------------------------------------------------- range search

def test_range_search_threshold_and_completeness(spark, sf_dir):
    import numpy as np

    got = {(r.query_id, r.vec_id): r.cosine
           for r in knn_range_search(spark, sf_dir).collect()}
    assert got, "τ must fire on the synthetic embeddings"
    e = {r.vec_id: np.array(r.embedding, dtype=float) for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    queries = [v for v in e if v % 100 == 0]
    expect = {}
    for q in queries:
        vq = e[q] / np.linalg.norm(e[q])
        for v, emb in e.items():
            if v == q:
                continue
            c = float((emb / np.linalg.norm(emb)) @ vq)
            if c >= _RANGE_TAU:
                expect[(q, v)] = c
    assert set(got) == set(expect)
    for k, c in got.items():
        assert c == pytest.approx(expect[k], abs=1e-5)
        assert c >= _RANGE_TAU


# ------------------------------------------------ manifest pruning

def test_manifest_prunes_files_and_preserves_answer(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        _manifest_pruned_paths, _tmp)

    out = scan_manifest_pruned(spark, sf_dir).collect()
    table_dir = _tmp(sf_dir, "lineitem_manifested")
    keep, total = _manifest_pruned_paths(
        spark, table_dir, "1996-05-01", "1996-06-01")
    # the one-month predicate must skip most of the 16 ranged files
    assert 0 < len(keep) < total
    # pruned answer == unpruned answer
    li = spark.read.parquet(table_dir)
    full = {r.l_returnflag: (r.n, r.total_qty) for r in (
        li.filter((F.col("l_shipdate") >= "1996-05-01")
                  & (F.col("l_shipdate") < "1996-06-01"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .collect())}
    got = {r.l_returnflag: (r.n, r.total_qty) for r in out}
    assert got == full


# ------------------------------------------------ unigram tokenizer

def test_unigram_viterbi_min_cost_and_tiebreak():
    from project_2_semantic_similarity_spark.operators.text import (
        unigram_viterbi_word)

    costs = {"a": 10, "b": 10, "ab": 15, "ba": 15, "aba": 40}
    # 'ab' (15) beats 'a'+'b' (20)
    assert unigram_viterbi_word("ab", costs, 999)[0] == ["ab"]
    # 'ab'+'a' == 'a'+'ba' == 25: fewer-token tie impossible (both
    # 2) -> path-string tiebreak picks '\x1fa\x1fba' < '\x1fab\x1fa'
    toks, c = unigram_viterbi_word("aba", costs, 999)
    assert c == 25 and toks == ["a", "ba"]
    # unk chars take the fallback cost
    toks, c = unigram_viterbi_word("axb", costs, 999)
    assert toks == ["a", "x", "b"] and c == 10 + 999 + 10


def test_unigram_viterbi_exhaustive_equivalence():
    """DP == brute-force enumeration under the same total order, on
    every word over a tiny alphabet."""
    import itertools

    from project_2_semantic_similarity_spark.operators.text import (
        unigram_viterbi_word)

    costs = {"a": 7, "b": 9, "c": 30, "ab": 11, "bc": 12, "abc": 25,
             "aa": 13}
    unk = 100

    def brute(w):
        best = None
        n = len(w)
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            toks = [w[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
            if any(t not in costs and len(t) > 1 for t in toks):
                continue
            tc = sum(costs.get(t, unk) for t in toks)
            key = (tc, len(toks), "".join("\x1f" + t for t in toks))
            if best is None or key < best:
                best = key
        return best

    for n in range(1, 7):
        for w in ("".join(p) for p in
                  itertools.product("abcx", repeat=n)):
            got_toks, got_c = unigram_viterbi_word(w, costs, unk)
            exp = brute(w)
            key = (got_c, len(got_toks),
                   "".join("\x1f" + t for t in got_toks))
            assert key == exp, (w, key, exp)


def test_unigram_cost_grid_margin(spark, sf_dir):
    """The -floor(1e6·ln p) integer costs are safe across engines
    only if no 1e6·ln(f/total) lands within float-disagreement
    distance of an integer grid line. Pin a generous margin."""
    import math

    from project_2_semantic_similarity_spark.operators.text import (
        bpe_word_tokens)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (docs.select(F.explode(F.split("text", " ")).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("cnt")))
    seed = bpe_word_tokens(words.select("word").distinct())
    pf = (words.join(seed, "word")
          .select(F.explode("tokens").alias("piece"), "cnt")
          .groupBy("piece").agg(F.sum("cnt").alias("f")).collect())
    total = float(sum(r.f for r in pf))
    for r in pf:
        x = 1e6 * math.log(r.f / total)
        assert abs(x - round(x)) > 1e-4, (r.piece, x)


def test_unigram_query_runs_and_differs_from_bpe(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_textlab import (
        text_bpe_tokenize, text_unigram_tokenize)

    uni = {r.doc_id: r for r in
           text_unigram_tokenize(spark, sf_dir).collect()}
    bpe = {r.doc_id: r.n_bpe_tokens for r in
           text_bpe_tokenize(spark, sf_dir).collect()}
    assert set(uni) == set(bpe)
    for d, r in uni.items():
        assert r.n_words <= r.n_uni_tokens
        # unigram never segments WORSE than all-singles, and its
        # min-cost objective can only tie or beat the BPE token
        # count when pieces score by their own seed frequencies —
        # not a theorem, so pin the weaker direction: within 2x
        assert r.n_uni_tokens <= 2 * bpe[d]
        assert r.nll_micro_nats > 0
