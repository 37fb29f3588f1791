"""Deterministic sampling invariants (operators/sampling.py):
partition completeness/disjointness, fraction accuracy, determinism
under repartitioning, stratified rate correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.operators.sampling import (
    hash_split,
    hex_threshold,
    stratified_sample,
)
from project_2_semantic_similarity_spark.sources import load_table


def test_hex_threshold_exact():
    assert hex_threshold(0.0) == "0000"
    assert hex_threshold(1.0) == "g"  # sorts after every hex bucket
    assert hex_threshold(0.5) == "8000"
    # 0.8 * 65536 = 52428.8 -> 52429
    assert hex_threshold(0.8) == format(52429, "04x")
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_split_partition_and_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    out = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    # complete partition: every row labeled, nothing dropped
    assert sum(counts.values()) == n
    # fractions hold to within binomial noise (n≈60 at sf0.001)
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)
    assert counts.get("train", 0) >= int(0.6 * n)


def test_hash_split_deterministic_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    split = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split
         for r in hash_split(d, "doc_id", split).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(d.repartition(13), "doc_id", split).collect()}
    assert a == b  # partitioning must not move any row between splits


def test_hash_split_rejects_bad_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        hash_split(d, "doc_id", {"train": 0.8, "val": 0.1})


def test_stratified_keeps_unsampled_strata_whole(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = {r["lang"]: r["n"]
            for r in d.groupBy("lang").agg(F.count("*").alias("n"))
            .collect()}
    out = stratified_sample(
        d, "lang", {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0},
        key="doc_id")
    got = {r["lang"]: r["n"]
           for r in out.groupBy("lang").agg(F.count("*").alias("n"))
           .collect()}
    for lang in ("de", "es", "fr", "zh"):
        assert got.get(lang, 0) == base.get(lang, 0), lang
    # en roughly halved (binomial at small n; just pin strictly fewer
    # and nonzero)
    assert 0 < got.get("en", 0) < base["en"]


def test_stratified_default_fraction_drops_unknown(spark):
    rows = [(1, "en"), (2, "xx"), (3, "xx")]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(d, "lang", {"en": 1.0}, key="doc_id")
    assert [r.doc_id for r in out.collect()] == [1]


def test_hash_split_plan_is_narrow(spark, sf_dir):
    """The split must add zero shuffles: one scan, one project."""
    d = load_table(spark, sf_dir, "documents")
    out = hash_split(d, "doc_id", {"train": 0.8, "val": 0.2, "test": 0.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_shards_balance_and_coverage(spark, sf_dir):
    """Every doc gets a shard in [0, n_shards); shard token totals
    cluster near the budget (loose bound — hash assignment)."""
    from project_2_semantic_similarity_spark.operators.sampling import (
        pack_shards)
    d = load_table(spark, sf_dir, "documents")
    budget = 500
    out = pack_shards(d, budget)
    assert out.count() == d.count()
    shards = {r["shard_id"]: r["tok"]
              for r in out.groupBy("shard_id")
              .agg(F.sum("n_tokens").alias("tok")).collect()}
    total = sum(shards.values())
    n_shards = -(-total // budget)  # ceil
    assert set(shards) <= set(range(n_shards))
    # uniform hash assignment: no shard more than 4x the budget
    assert max(shards.values()) < 4 * budget


def test_pack_shards_deterministic(spark, sf_dir):
    from project_2_semantic_similarity_spark.operators.sampling import (
        pack_shards)
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.shard_id for r in pack_shards(d, 500).collect()}
    b = {r.doc_id: r.shard_id
         for r in pack_shards(d.repartition(7), 500).collect()}
    assert a == b


def test_temperature_sample_flattens_head(spark):
    """T=2 mixing: the tail source gets a strictly higher keep rate
    than the head (∝ √count scaling), rates never exceed 1, and the
    sample is identical under any repartitioning (md5 decisions)."""
    from project_2_semantic_similarity_spark.operators.sampling import (
        temperature_sample)

    rows = ([(i, "head") for i in range(80)]
            + [(100 + i, "tail") for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df, "source", temperature=2.0,
                              target_fraction=0.5, key="doc_id")
    rates = {r.source: r.rate
             for r in kept.select("source", "rate").distinct().collect()}
    assert rates["tail"] > rates["head"]
    assert all(0.0 < v <= 1.0 for v in rates.values())
    k1 = sorted(r.doc_id for r in kept.collect())
    k2 = sorted(r.doc_id for r in
                temperature_sample(df.repartition(7), "source", 2.0,
                                   0.5, "doc_id").collect())
    assert k1 == k2


def test_context_window_view_reconstructs_batches(spark, sf_dir):
    """The window view must tile the packed token stream exactly:
    every window except the last carries 512 tokens of contiguous
    slices starting at offset 0, each document's slices sum to its
    token count, and the view agrees row-for-row with the per-doc
    arithmetic of corpus_pack_context_windows."""
    import __spark_entry__ as e

    q = e.queries()
    view = q["corpus_context_window_view"](spark, sf_dir).collect()
    packed = {r["doc_id"]: r
              for r in q["corpus_pack_context_windows"](
                  spark, sf_dir).collect()}

    by_window: dict = {}
    by_doc: dict = {}
    for r in view:
        by_window.setdefault(r["window_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)

    last_w = max(by_window)
    for w, rows in by_window.items():
        rows.sort(key=lambda r: r["window_offset"])
        # contiguous tiling from offset 0
        pos = 0
        for r in rows:
            assert r["window_offset"] == pos, (w, r)
            pos += r["slice_len"]
        if w != last_w:
            assert pos == 512, (w, pos)
        else:
            assert 0 < pos <= 512

    for d, rows in by_doc.items():
        p = packed[d]
        rows.sort(key=lambda r: r["doc_slice_start"])
        assert sum(r["slice_len"] for r in rows) == p["n_tokens"]
        assert len(rows) == p["n_windows_spanned"]
        assert rows[0]["window_id"] == p["window_id"]
        assert rows[0]["window_offset"] == p["window_offset"]
        assert rows[0]["doc_slice_start"] == 0
    # zero-token docs appear in the packed relation, never the view
    assert set(by_doc) == {d for d, p in packed.items()
                           if p["n_tokens"] > 0}


def test_doc_starts_and_separator_stream_compose(spark, sf_dir):
    """The r11 packing trio must agree with each other: (a) the
    separator stream carries exactly one <eos> (id 3) per
    token-bearing doc and tiles global slots contiguously with no
    hole or collision; (b) each corpus_window_doc_starts slot holds
    exactly the document's pos-0 token in the PLAIN (no-separator)
    coordinate system."""
    from project_2_semantic_similarity_spark.plans import registry

    registry.load_all()
    W = 512
    sep = registry.QUERIES["corpus_context_window_ids_sep"](
        spark, sf_dir).localCheckpoint()
    n_docs_with_words = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.filter(F.split("text", " "),
                                lambda w: w != "")) > 0).count())
    assert sep.filter(F.col("token_id") == 3).count() == n_docs_with_words
    total = sep.count()
    g = sep.select((F.col("window_id") * W
                    + F.col("window_pos")).alias("g"))
    assert g.distinct().count() == total
    assert g.agg(F.max("g")).collect()[0][0] == total - 1

    starts = registry.QUERIES["corpus_window_doc_starts"](spark, sf_dir)
    assert starts.count() == n_docs_with_words
    ccwi = registry.QUERIES["corpus_context_window_ids"](spark, sf_dir)
    first = (registry.QUERIES["text_bpe_encode_ids"](spark, sf_dir)
             .filter(F.col("pos") == 0)
             .select("doc_id", F.col("token_id").alias("first_id")))
    joined = (starts.join(ccwi, ["window_id", "window_pos"])
              .join(first, "doc_id"))
    assert joined.count() == n_docs_with_words
    assert joined.filter(
        F.col("token_id") != F.col("first_id")).count() == 0
