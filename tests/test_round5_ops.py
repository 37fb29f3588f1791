"""Round-5 additions: binned range join, repeated-passage dedup,
distributed Gram matrix, TPC-H Q5 — semantic invariants beyond the
driver's oracle hash checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.plans.q_dedup import (
    _PASSAGE_W,
    dedup_passage,
)
from project_2_semantic_similarity_spark.plans.q_knn import embedding_gram
from project_2_semantic_similarity_spark.plans.q_relational import (
    join_range_interval,
    sql_api_tpch_q5,
)
from project_2_semantic_similarity_spark.sources import load_table


def test_range_interval_matches_direct_theta_join(spark, sf_dir):
    """The binned equi-join + residual filter must return exactly what
    the direct (quadratic) inequality join returns — binning is a
    physical rewrite, never a semantic one."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 450000))
    li = load_table(spark, sf_dir, "lineitem")
    direct = (
        o.join(
            li,
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.to_date("l_shipdate")
               < F.date_add(F.to_date("o_orderdate"), 7)))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )
    binned = join_range_interval(spark, sf_dir)
    assert binned.exceptAll(direct).count() == 0
    assert direct.exceptAll(binned).count() == 0


def test_dedup_passage_short_docs_emit_no_windows(spark):
    """Docs shorter than W tokens contribute nothing (the
    sequence(0, negative) inversion guard): two identical short docs
    must NOT register as a repeated passage."""
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"),
         (3, "one two three four five six seven eight nine"),
         (4, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    import project_2_semantic_similarity_spark.plans.q_dedup as qd
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"),
                 lambda t: t != F.lit("")).alias("toks"))
    win = toks.filter(F.size("toks") >= _PASSAGE_W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - _PASSAGE_W),
                lambda i: F.md5(F.concat_ws(
                    " ", F.slice("toks", i + 1, _PASSAGE_W)))),
        ).alias("passage_md5"))
    rows = (win.groupBy("passage_md5")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= 2).collect())
    # only the 9-token twins share windows: positions 0 and 1 -> 2
    # shared 8-token passages; the 2-token docs contribute none
    assert len(rows) == 2
    assert all(r.n_docs == 2 for r in rows)


def test_dedup_passage_counts(spark, sf_dir):
    """Every reported passage occurs at least n_docs times and in at
    least 2 docs."""
    out = dedup_passage(spark, sf_dir)
    bad = out.filter(
        (F.col("n_docs") < 2)
        | (F.col("n_occurrences") < F.col("n_docs"))).count()
    assert bad == 0


def test_embedding_gram_diag_positive_and_matches_norms(spark, sf_dir):
    """G[i,i] = sum of squares of coordinate i — strictly positive for
    non-degenerate data, and G is the upper triangle only."""
    g = embedding_gram(spark, sf_dir).collect()
    assert all(r.i <= r.j for r in g)
    diag = {r.i: r.g for r in g if r.i == r.j}
    assert len(diag) == 64
    assert all(v > 0 for v in diag.values())
    # G[0,0] equals the directly-computed sum of squares of coord 0
    e = load_table(spark, sf_dir, "embeddings")
    direct = e.select(
        F.sum(F.pow(F.col("embedding")[0].cast("double"), 2))
        .alias("s")).first().s
    assert diag[0] == pytest.approx(direct, abs=1e-5)


def test_tpch_q5_revenue_positive_sorted(spark, sf_dir):
    rows = sql_api_tpch_q5(spark, sf_dir).collect()
    assert rows
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)


def test_zorder_files_tile_both_dimensions(spark, sf_dir):
    """After the z-ordered write, per-file min/max footer stats must
    be materially tighter than the global range on BOTH keys — the
    property that lets stats-based skipping serve 2-dim predicates.
    (A single-key sort gives tight ranges on that key only.)"""
    import glob

    import pyarrow.parquet as pq
    from project_2_semantic_similarity_spark.plans.q_relational import (
        sink_zorder, _tmp)

    sink_zorder(spark, sf_dir).collect()
    files = sorted(glob.glob(_tmp(sf_dir, "orders_zorder") + "/*.parquet"))
    assert len(files) >= 4
    spans_cust, spans_date = [], []
    glob_cust, glob_date = [None, None], [None, None]
    for f in files:
        md = pq.read_metadata(f)
        cmin = cmax = dmin = dmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None:
                    continue
                if col.path_in_schema == "o_custkey":
                    cmin = st.min if cmin is None else min(cmin, st.min)
                    cmax = st.max if cmax is None else max(cmax, st.max)
                if col.path_in_schema == "o_orderdate":
                    dmin = st.min if dmin is None else min(dmin, st.min)
                    dmax = st.max if dmax is None else max(dmax, st.max)
        spans_cust.append((cmin, cmax))
        spans_date.append((dmin, dmax))
        glob_cust = [cmin if glob_cust[0] is None else min(glob_cust[0], cmin),
                     cmax if glob_cust[1] is None else max(glob_cust[1], cmax)]
        glob_date = [dmin if glob_date[0] is None else min(glob_date[0], dmin),
                     dmax if glob_date[1] is None else max(glob_date[1], dmax)]
    full_cust = glob_cust[1] - glob_cust[0]
    full_date = (glob_date[1] - glob_date[0]).total_seconds()
    # at least one file's custkey span AND one file's date span is
    # under 60% of the global range: z-tiles are bounded in both dims,
    # where a pure date sort would leave every file's custkey span at
    # ~100%
    assert any((cmax - cmin) < 0.6 * full_cust
               for cmin, cmax in spans_cust)
    assert any((dmax - dmin).total_seconds() < 0.6 * full_date
               for dmin, dmax in spans_date)


def test_agg_mode_ties_break_by_value(spark):
    """Engineered tie: two types with equal counts — the mode must be
    the lexicographically smaller one, every run."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2
    df = spark.createDataFrame(
        [("b1", "zeta"), ("b1", "zeta"), ("b1", "alpha"), ("b1", "alpha"),
         ("b2", "only")],
        "p_brand string, p_type string")
    counted = df.groupBy("p_brand", "p_type").agg(
        F2.count("*").alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(
        F2.col("cnt").desc(), F2.col("p_type").asc())
    got = {r.p_brand: r.p_type for r in
           counted.withColumn("rn", F2.row_number().over(w))
           .filter(F2.col("rn") == 1).collect()}
    assert got == {"b1": "alpha", "b2": "only"}


def test_embedding_standardize_unit_moments(spark, sf_dir):
    """Standardized output has per-dim mean ~0 and population std ~1
    (up to the 6 dp edge rounding)."""
    from project_2_semantic_similarity_spark.plans.q_knn import (
        embedding_standardize)
    z = embedding_standardize(spark, sf_dir)
    m = z.groupBy("i").agg(
        F.avg("z").alias("mu"), F.stddev_pop("z").alias("sd")).collect()
    assert len(m) == 64
    assert all(abs(r.mu) < 1e-4 for r in m)
    assert all(abs(r.sd - 1.0) < 1e-4 for r in m)


def test_anomaly_zscore_all_beyond_threshold(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_analytics import (
        events_anomaly_zscore)
    rows = events_anomaly_zscore(spark, sf_dir).collect()
    assert rows
    assert all(abs(r.z) > 2.5 for r in rows)


def test_merge_upsert_key_preserved_and_updates_applied(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        merge_upsert)
    base = load_table(spark, sf_dir, "orders")
    merged = merge_upsert(spark, sf_dir)
    # same key set, no dupes (copy-on-write preserves the PK)
    assert merged.count() == base.count()
    assert merged.select("o_orderkey").distinct().count() == base.count()
    # every 97th key got the update, nobody else did
    upd = merged.filter(F.col("o_orderkey") % 97 == 0)
    assert upd.filter(F.col("o_orderstatus") != "U").count() == 0
    untouched = merged.filter(F.col("o_orderkey") % 97 != 0)
    assert untouched.filter(F.col("o_orderstatus") == "U").count() == 0


def test_scd2_versions_are_contiguous_per_user(spark, sf_dir):
    """Versions per user are 1..n with no gaps, ranges don't invert,
    and consecutive versions never share a state (else they'd have
    been merged)."""
    from pyspark.sql import Window
    from project_2_semantic_similarity_spark.plans.q_relational import (
        scd2_history)
    h = scd2_history(spark, sf_dir)
    assert h.filter(F.col("valid_from") > F.col("valid_to")).count() == 0
    w = Window.partitionBy("user_id").orderBy("version")
    flagged = h.select(
        "user_id", "version", "state",
        (F.col("version") - F.lag("version").over(w)).alias("gap"),
        (F.lag("state").over(w) == F.col("state")).alias("same"))
    assert flagged.filter(F.col("gap").isNotNull()
                          & (F.col("gap") != 1)).count() == 0
    assert flagged.filter(F.col("same")).count() == 0
    assert h.groupBy("user_id").agg(
        F.min("version").alias("v")).filter(F.col("v") != 1).count() == 0


def test_agg_corr_bounds_and_slope_identity(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        agg_corr)
    rows = agg_corr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0
    # slope shares covar's sign
    assert all((r.slope >= 0) == (r.covar_qty_price >= 0) for r in rows)


def test_join_fuzzy_recovers_every_corruption(spark, sf_dir):
    """Each probe is a catalog name minus its last char, so a match at
    distance ≤ 1 must exist and be found for every probe (blocking
    may not lose the engineered corruption)."""
    from project_2_semantic_similarity_spark.plans.q_relational import (
        join_fuzzy)
    p = load_table(spark, sf_dir, "part")
    n_probes = p.filter(F.col("p_partkey") % 50 == 0).count()
    out = join_fuzzy(spark, sf_dir)
    assert out.count() == n_probes
    assert out.filter(F.col("dist") > 1).count() == 0
    # and the matched name really is within the declared distance
    bad = out.filter(
        F.levenshtein("q_name", "matched_name") != F.col("dist")).count()
    assert bad == 0


def test_prep_pipeline_lsh_equals_exact_pipeline(spark, sf_dir):
    """The LSH-discovery prep pipeline must produce the exact
    pipeline's survivor set on the fixture corpus (deterministic
    md5-seeded discovery — equality is a stable property of the
    corpus, pinned here so the shared oracle is a real check)."""
    from project_2_semantic_similarity_spark.plans.q_textlab import (
        corpus_prep_pipeline, corpus_prep_pipeline_lsh)
    a = corpus_prep_pipeline(spark, sf_dir)
    b = corpus_prep_pipeline_lsh(spark, sf_dir)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_prep_pipeline_staged_equals_lazy(spark, sf_dir, tmp_path):
    """The scratch-bounded scale path (parquet checkpoints at every
    wide stage boundary — r6 VERDICT #6) must be a pure physical
    rewrite: identical survivor rows to the single-lazy-plan query
    path."""
    from project_2_semantic_similarity_spark.plans.q_textlab import (
        _prep_lsh_survivors, corpus_prep_pipeline_lsh)
    lazy = corpus_prep_pipeline_lsh(spark, sf_dir)
    staged = _prep_lsh_survivors(spark, sf_dir,
                                 stage_to=str(tmp_path / "stages"))
    assert lazy.exceptAll(staged).count() == 0
    assert staged.exceptAll(lazy).count() == 0
    # the boundary artifacts actually landed (the mechanism, not
    # just the answer)
    import os
    assert {"kept", "shingles", "sigs", "cands", "near_losers"} <= \
        set(os.listdir(tmp_path / "stages"))


def test_kmv_estimate_within_bound_and_union_sane(spark, sf_dir):
    """KMV(64) relative error is ~1/sqrt(k-1) ≈ 12.6%; allow 3x.
    The merged union estimate must be >= each side's true count lower
    bound and <= sum of sides."""
    from project_2_semantic_similarity_spark.plans.q_relational import (
        agg_kmv_portable)
    ev = load_table(spark, sf_dir, "events")
    true = {t: ev.filter(F.col("event_type") == t)
            .select("user_id").distinct().count()
            for t in ("click", "view")}
    true_union = (ev.filter(F.col("event_type").isin("click", "view"))
                  .select("user_id").distinct().count())
    est = {r.scope: r.est_distinct
           for r in agg_kmv_portable(spark, sf_dir).collect()}
    for t in ("click", "view"):
        assert abs(est[t] - true[t]) <= max(3 * 0.126 * true[t], 2.0)
    assert abs(est["click+view"] - true_union) <= max(
        3 * 0.126 * true_union, 2.0)


def test_win_streak_bounds(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_analytics import (
        win_streak)
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    out = win_streak(spark, sf_dir)
    assert out.count() == n_users
    days = (ev.select("user_id", F.to_date("ts").alias("d")).distinct()
            .groupBy("user_id").agg(F.count("*").alias("nd")))
    joined = out.join(days, "user_id")
    # a streak can't exceed the user's total active days
    assert joined.filter(
        F.col("longest_streak") > F.col("nd")).count() == 0


def test_ab_test_arms_partition_users(spark, sf_dir):
    """Hash-split assignment is a partition: n_a + n_b = all events
    of that type, and the z-stat is finite everywhere."""
    import math
    from project_2_semantic_similarity_spark.plans.q_analytics import (
        events_ab_test)
    ev = load_table(spark, sf_dir, "events")
    totals = {r.event_type: r.n for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n"))
              .collect()}
    for r in events_ab_test(spark, sf_dir).collect():
        assert r.n_a + r.n_b == totals[r.event_type]
        assert math.isfinite(r.z_stat)


def test_market_basket_pairs_ordered_and_support_bounded(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_relational import (
        orders_market_basket)
    rows = orders_market_basket(spark, sf_dir).collect()
    assert rows
    n_orders = (load_table(spark, sf_dir, "lineitem")
                .select("l_orderkey").distinct().count())
    for r in rows:
        assert r.part_a < r.part_b
        assert 2 <= r.support <= n_orders
        assert r.lift > 0


def test_pmi_symmetric_pairs_and_gate(spark, sf_dir):
    from project_2_semantic_similarity_spark.plans.q_text import (
        text_cooccurrence_pmi)
    rows = text_cooccurrence_pmi(spark, sf_dir).collect()
    assert rows
    assert all(r.term_a < r.term_b for r in rows)
    assert all(r.n_co >= 5 for r in rows)


def test_knn_pq_recall_and_determinism(spark, sf_dir):
    """PQ with the seeded-sample codebook must (a) be bit-stable
    across runs and (b) recover at least half of the exact top-10
    after the 8x-candidate exact re-rank at this scale (measured
    0.5-0.9 across sf0.001-0.1; the Lloyd-trained codebook variant
    only improves on this floor)."""
    from project_2_semantic_similarity_spark.plans.q_knn import (
        knn_embeddings, knn_pq)

    a = knn_pq(spark, sf_dir).collect()
    b = knn_pq(spark, sf_dir).collect()
    assert a == b
    exact = {r["vec_id"] for r in knn_embeddings(spark, sf_dir).collect()}
    got = {r["vec_id"] for r in a}
    assert len(a) == 10
    assert len(got & exact) / len(exact) >= 0.5
    # re-rank stage is EXACT arithmetic: every returned cosine equals
    # the brute-force cosine for that vec_id
    brute = {r["vec_id"]: r["cosine"]
             for r in knn_embeddings(spark, sf_dir).collect()}
    for r in a:
        if r["vec_id"] in brute:
            assert abs(r["cosine"] - brute[r["vec_id"]]) < 1e-9


def test_knn_ivf_pq_recall_and_exact_rerank(spark, sf_dir):
    """IVF list pruning stacked on PQ must still recover a usable
    share of the exact top-10 (both approximations compound), stay
    bit-stable across runs, and return EXACT cosines for whatever it
    does return (the re-rank stage is exact arithmetic)."""
    from project_2_semantic_similarity_spark.plans.q_knn import (
        knn_embeddings, knn_ivf_pq)

    a = knn_ivf_pq(spark, sf_dir).collect()
    assert a == knn_ivf_pq(spark, sf_dir).collect()
    assert len(a) == 10
    brute = {r["vec_id"]: r["cosine"]
             for r in knn_embeddings(spark, sf_dir).collect()}
    got = {r["vec_id"] for r in a}
    assert len(got & set(brute)) / len(brute) >= 0.4
    for r in a:
        if r["vec_id"] in brute:
            assert abs(r["cosine"] - brute[r["vec_id"]]) < 1e-9


def test_bpe_segment_matches_reference_fold(spark):
    """The Spark-side BPE (rank-ordered `aggregate` left-folds,
    operators/text.py bpe_segment) against an independent pure-Python
    fold, over words exercising multi-level chains, cross-rank
    interactions (rank-1 (t,a) fires inside 'data' before rank-22
    (d,a)), repeats ('tata', 'windowwindow'), and untouched words."""
    from project_2_semantic_similarity_spark.operators.text import (
        BPE_MERGES, bpe_word_tokens)

    # merges-table invariant: every input symbol is a single char or
    # the output of an EARLIER rank — the property that makes
    # rank-ordered single-pass application equal greedy min-rank BPE
    known = set()
    for a, b in BPE_MERGES:
        for s in (a, b):
            assert len(s) == 1 or s in known, (a, b)
        known.add(a + b)

    def seg(word):
        syms = list(word)
        for a, b in BPE_MERGES:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return syms

    words = ["table", "value", "scan", "window", "data", "query",
             "fast", "hash", "spark", "the", "key", "row", "big",
             "tata", "anan", "sss", "windowwindow", "thethe", "t"]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {r["word"]: (list(r["tokens"]), r["n_tok"])
           for r in bpe_word_tokens(df).collect()}
    for w in words:
        want = seg(w)
        assert got[w] == (want, len(want)), (w, got[w], want)
    # the showcase chains actually merge to single tokens
    assert got["table"][1] == got["window"][1] == got["query"][1] == 1
