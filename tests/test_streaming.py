"""Streaming/batch-equivalence and watermark-semantics tests
(SURVEY.md §5.2.4) at sf0.001.

The DuckDB hash parity of each streaming op is covered by
tools/verify_local.py / the driver; these tests pin the *streaming*
behaviors an SQL oracle can't see: micro-batch replay equals the
batch DataFrame plan, the doubled stream actually deduplicates, and
late rows beyond the watermark are dropped (not just absent)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as e
from project_2_semantic_similarity_spark.sources import load_table
from project_2_semantic_similarity_spark.streaming import ops as S


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_equals_batch(spark, sf_dir):
    got = e.queries()["stream_tumbling_count"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("h", "yyyy-MM-dd HH:mm:ss")
                 .alias("window_start"), "event_type", "n", "sum_value")
    )
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_sliding_each_event_in_four_windows(spark, sf_dir):
    got = e.queries()["stream_sliding_avg"](spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    total = got.agg(F.sum("n")).collect()[0][0]
    assert total == 4 * n_events


def test_session_gap_semantics(spark, sf_dir):
    got = e.queries()["stream_session"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # sessions partition the events: per-user event counts add up
    per_user = {r.user_id: r.s for r in
                got.groupBy("user_id").agg(F.sum("n_events").alias("s"))
                .collect()}
    expect = {r.user_id: r.s for r in
              ev.groupBy("user_id").agg(F.count("*").alias("s")).collect()}
    assert per_user == expect
    # every session spans exactly [first event, last event + 30 min]
    bad = got.filter(
        F.col("session_end").cast("timestamp")
        < F.col("session_start").cast("timestamp")
        + F.expr("INTERVAL 30 MINUTES")).count()
    assert bad == 0


def test_dedup_doubled_stream(spark, sf_dir):
    got = e.queries()["stream_dedup_watermark"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert got.count() == ev.count()  # doubled input, distinct output
    assert got.select("event_id").distinct().count() == ev.count()


def test_custom_state_accumulates_across_batches(spark, sf_dir):
    # Two micro-batches of the same file: state must carry over, so
    # the totals emitted in batch 2 are exactly double the per-user
    # batch totals.
    d = S.stage_doubled_events_dir(sf_dir)
    ev = S.read_events_stream(spark, d, maxFilesPerTrigger="1")
    out = S.run_to_memory(S.custom_state_totals(ev),
                          "custom_state_2batch", "update")
    final = {r.user_id: r.n_events for r in
             out.groupBy("user_id")
             .agg(F.max("n_events").alias("n_events")).collect()}
    expect = {r.user_id: 2 * r.n for r in
              load_table(spark, sf_dir, "events")
              .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert final == expect


def test_late_data_dropped_by_watermark(spark, sf_dir):
    got = e.queries()["stream_late_data"](spark, sf_dir)
    # the late batch is shifted 60 days back; no emitted window may
    # predate the real data's range
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.date_format(F.date_trunc("hour", F.min("ts")),
                              "yyyy-MM-dd HH:mm:ss").alias("x")).collect()[0].x
    assert got.filter(F.col("window_start") < lo).count() == 0
    # and the drop actually happened via the watermark path
    q = [x for x in spark.streams.active if x.name == "stream_late_data"]
    prog = (q[0].recentProgress if q else [])
    dropped = sum(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                  for p in prog if p["stateOperators"])
    # query already stopped by availableNow → fall back to re-running
    if not prog:
        d = S.stage_late_events_dir(sf_dir)
        ev2 = S.read_events_stream(spark, d, maxFilesPerTrigger="1")
        agg = (ev2.withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour")).agg(F.count("*").alias("n")))
        qq = (agg.writeStream.format("memory").queryName("late_metric")
              .outputMode("append").trigger(availableNow=True).start())
        qq.awaitTermination(180)
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in qq.recentProgress if p["stateOperators"])
    assert dropped > 0


def test_run_to_memory_raises_on_timeout(spark, sf_dir):
    """A replay that can't finish inside the timeout must raise, not
    silently return a partial memory table (ADVICE round 1)."""
    import pytest

    ev = S.read_events_stream(spark, S.stage_events_dir(sf_dir))
    with pytest.raises(TimeoutError, match="did not finish"):
        S.run_to_memory(S.tumbling_counts(ev), "timeout_probe",
                        "complete", timeout_s=0.001)


def test_events_dual_ts_layouts(spark, tmp_path):
    """Both physical events layouts — TIMESTAMP(NANOS) (older
    testdata generations) and TIMESTAMP(MICROS)/NTZ (current) — must
    decode to the SAME session-TZ timestamps in batch AND streaming
    reads. The current testdata is all-micros, so without this
    fixture the nanos path has no coverage left (round-3 lesson: the
    streaming reader kept the nanos division on micros data and
    silently landed every event in 1970)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_2_semantic_similarity_spark.sources.tables import (
        events_ts_is_nanos)

    us_epochs = [1_700_000_000_000_000, 1_700_000_003_600_000]
    expect = [datetime.datetime.utcfromtimestamp(u / 1e6)
              for u in us_epochs]

    def write_events(path, unit):
        factor = 1000 if unit == "ns" else 1
        t = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([u * factor for u in us_epochs],
                           pa.timestamp(unit)),
            "user_id": pa.array([7, 7], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        })
        # parquet 2.6 keeps ns as TIMESTAMP(NANOS) (no µs coercion)
        pq.write_table(t, path, version="2.6")

    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        write_events(str(d / "events.parquet"), unit)
        assert events_ts_is_nanos(str(d / "events.parquet")) == (unit == "ns")

        batch = load_table(spark, str(d), "events")
        got_batch = [r.ts for r in batch.orderBy("event_id").collect()]
        assert got_batch == expect, f"batch {unit}: {got_batch}"

        stream = S.read_events_stream(spark, str(d))
        out = S.run_to_memory(stream.select("event_id", "ts"),
                              f"dual_layout_{unit}", "append")
        got_stream = [r.ts for r in out.orderBy("event_id").collect()]
        assert got_stream == expect, f"stream {unit}: {got_stream}"


def test_batch_sessionize_is_stream_session_twin(spark, sf_dir):
    """win_sessionize (gaps-and-islands windows) must find the SAME
    sessions as stream_session (session_window state store): same
    (user, start, n_events, sum_value) sets — the >= gap boundary is
    session_window's exclusive end."""
    batch = e.queries()["win_sessionize"](spark, sf_dir)
    stream = e.queries()["stream_session"](spark, sf_dir)
    b = sorted((r.user_id, r.session_start, r.n_events, r.sum_value)
               for r in batch.collect())
    s = sorted((r.user_id, r.session_start, r.n_events, r.sum_value)
               for r in stream.collect())
    assert b == s


def test_latest_state_idempotent_under_duplicate_delivery(spark, sf_dir):
    """The CDC latest-wins snapshot must be replay/duplicate-proof:
    feeding every event TWICE (at-least-once delivery) yields the
    byte-identical snapshot, because max_by over (ts, event_id) is
    idempotent — the property that lets the view be rebuilt from an
    unreliable log."""
    from pyspark.sql import functions as F
    from project_2_semantic_similarity_spark.streaming import ops as S

    ev1 = S.read_events_stream(spark, S.stage_events_dir(sf_dir))
    ev2 = S.read_events_stream(spark, S.stage_doubled_events_dir(sf_dir))

    def snapshot(ev, name):
        snap = (ev.groupBy("user_id")
                .agg(F.max_by(
                    F.struct("event_id", "event_type", "ts", "value"),
                    F.struct("ts", "event_id")).alias("s"))
                .select("user_id", "s.event_id", "s.ts"))
        return S.run_to_memory(snap, name, "complete")

    a = snapshot(ev1, "lsi_once")
    b = snapshot(ev2, "lsi_twice")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rollup_cascade_matches_batch_hypertable_daily(spark, sf_dir):
    """Batch/stream twin pin (the win_sessionize ↔ stream_session
    pattern): the streamed hourly→daily cascade must equal the batch
    hypertable rollup's daily grain row-for-row."""
    from pyspark.sql import functions as F
    from project_2_semantic_similarity_spark.plans.q_analytics import (
        events_rollup_hypertable)
    from project_2_semantic_similarity_spark.plans.q_streaming import (
        stream_rollup_cascade)

    streamed = stream_rollup_cascade(spark, sf_dir)
    batch_daily = (
        events_rollup_hypertable(spark, sf_dir)
        .filter(F.col("grain") == "day")
        .select(F.substring("bucket", 1, 10).alias("day"),
                "event_type", "n_events", "sum_value"))
    assert streamed.count() == batch_daily.count()
    assert streamed.exceptAll(batch_daily).count() == 0
    assert batch_daily.exceptAll(streamed).count() == 0


def test_rocksdb_state_store_provider_takes_effect(spark, sf_dir):
    """SCALE.md's knob table claims stateful streams run on the
    RocksDB state store at scale (state larger than heap). Execute a
    stateful query under the provider and assert (a) the provider is
    ACTUALLY in the loop — the state operator's progress metrics are
    RocksDB ones — and (b) results equal the default-provider run."""
    from project_2_semantic_similarity_spark.streaming import ops as S

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming."
             "state.RocksDBStateStoreProvider")
    path = S.stage_events_dir(sf_dir)
    baseline = S.run_to_memory(
        S.session_counts(S.read_events_stream(spark, path)),
        "rocksdb_baseline", "complete").collect()

    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        stream = S.session_counts(S.read_events_stream(spark, path))
        for q in spark.streams.active:
            if q.name == "rocksdb_probe":
                q.stop()
        q = (stream.writeStream.format("memory")
             .queryName("rocksdb_probe").outputMode("complete")
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)
        ops = (q.lastProgress or {}).get("stateOperators") or []
        metrics = {m for op in ops
                   for m in (op.get("customMetrics") or {})}
        assert any("rocksdb" in m.lower() for m in metrics), (
            "no RocksDB state-store metrics in progress; provider "
            f"did not take effect (metrics: {sorted(metrics)[:5]})")
        got = spark.table("rocksdb_probe").collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert sorted(map(tuple, got)) == sorted(map(tuple, baseline))


def test_ema_state_carries_across_batches(spark, sf_dir):
    # Events split into two micro-batch files at the median ts
    # (mtimes ordered): the fold must carry ema/n state across the
    # batch boundary, so the final per-user state equals the
    # single-batch replay (which the DuckDB recursive-CTE oracle
    # verifies independently).
    import os
    import time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tag = S._stream_tag(sf_dir)
    from project_2_semantic_similarity_spark.scratch import scratch_path
    d = scratch_path(f"stream_{tag}", "events_ema2")
    f1, f2 = f"{d}/batch0.parquet", f"{d}/batch1.parquet"
    if not (os.path.exists(f1) and os.path.exists(f2)):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/events.parquet")
        ts_sorted = pc.array_sort_indices(t["ts"].combine_chunks())
        cut = t["ts"].combine_chunks()[ts_sorted[len(t) // 2].as_py()]
        pq.write_table(t.filter(pc.less_equal(t["ts"], cut)), f1)
        pq.write_table(t.filter(pc.greater(t["ts"], cut)), f2)
        now = time.time()
        os.utime(f1, (now - 60, now - 60))
        os.utime(f2, (now, now))
    ev = S.read_events_stream(spark, d, maxFilesPerTrigger="1")
    out = S.run_to_memory(S.ema_state(ev), "ema_state_2batch", "update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {(r.user_id): (r.n_events, r.ema) for r in
             out.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).collect()}
    single = {(r.user_id): (r.n_events, r.ema) for r in
              S.run_to_memory(
                  S.ema_state(S.read_events_stream(
                      spark, S.stage_events_dir(sf_dir))),
                  "ema_state_1batch", "update").collect()}
    assert final == single


def test_bitmap_distinct_over_unbounded_rate_source(spark):
    """The bitmap-word state machine under a genuinely UNBOUNDED
    source (r7 VERDICT #5): Spark's built-in ``rate`` source emits a
    monotone row counter forever; we run the same watermark + day-
    window + bit_or aggregation live for several processing-time
    triggers, stop mid-stream, and verify the captured state against
    the batch semantics of exactly the rows that were ingested.

    With numPartitions=1 the ingested set is by construction a
    PREFIX {0..V} of the counter, so the oracle needs no side
    channel: recover the value set from the bitmap itself, assert it
    is gap-free from 0 (any dropped/duplicated micro-batch or
    mis-merged word breaks this), and assert every value landed in
    the day window the batch computation assigns it."""
    import time

    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "500")
           .option("numPartitions", "1").load())
    # synthetic event time: one hour per counter tick -> the day
    # window rolls every 24 values; arrival order is monotone so the
    # 1-hour watermark never drops anything.
    ev = src.select(
        F.timestamp_seconds(F.lit(0) + F.col("value") * 3600)
         .alias("ts"),
        F.col("value").alias("user_id"))
    agg = (ev.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 day").alias("w"),
                    (F.col("user_id") / 64).cast("long").alias("word"))
           .agg(F.bit_or(F.expr(
               "shiftleft(CAST(1 AS BIGINT), "
               "CAST(user_id % 64 AS INT))")).alias("mask"))
           .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"),
                   "word", "mask"))
    name = "rate_bitmap_distinct"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql(
                f"SELECT coalesce(sum(bit_count(mask)), 0) AS n "
                f"FROM {name}").collect()[0]["n"]
            if n >= 120:  # several triggers, several day windows
                break
            time.sleep(0.5)
        else:
            raise TimeoutError("rate stream produced too few rows")
    finally:
        q.stop()
    rows = spark.table(name).collect()
    values = sorted(
        r["word"] * 64 + b
        for r in rows for b in range(64) if (r["mask"] >> b) & 1)
    # prefix-exactness: no gaps, no phantom bits, no duplicates
    assert values == list(range(len(values))) and len(values) >= 120
    # day assignment matches batch semantics for every ingested value
    day_of = {(r["day"], r["word"] * 64 + b)
              for r in rows for b in range(64) if (r["mask"] >> b) & 1}
    expect = {(time.strftime("%Y-%m-%d",
                             time.gmtime((v * 3600 // 86400) * 86400)),
               v) for v in values}
    assert day_of == expect


def test_bitmap_distinct_state_merges_across_batches(spark, sf_dir):
    # The doubled stream delivers every event twice in two
    # micro-batches: bit_or state must absorb the duplicates, so the
    # final popcount rollup equals the batch COUNT(DISTINCT) — the
    # idempotence that makes bitmap state safe under at-least-once
    # delivery.
    d = S.stage_doubled_events_dir(sf_dir)
    ev = S.read_events_stream(spark, d, maxFilesPerTrigger="1")
    mat = S.run_to_memory(S.bitmap_distinct_daily(ev),
                          "bitmap_distinct_2batch", "complete")
    got = {r["day"]: r["n"] for r in
           mat.groupBy("day")
           .agg(F.sum(F.bit_count("mask")).cast("bigint").alias("n"))
           .collect()}
    expect = {r["day"]: r["n"] for r in
              load_table(spark, sf_dir, "events")
              .groupBy(F.date_format(F.col("ts").cast("date"),
                                     "yyyy-MM-dd").alias("day"))
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == expect


def test_bpe_encode_stream_is_batch_encode_twin(spark):
    """The stateless streaming tokenizer (constants-only mapInPandas)
    must produce exactly the batch encode's rows on the same docs —
    mapInPandas runs identically on a batch frame, so the twin pin
    needs no staging: same fixture through both paths, row-set
    equal. Covers multi-byte UTF-8 and the empty-word filter."""
    from project_2_semantic_similarity_spark.operators import text as T
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "the fast  query"), (1, "café straße"), (2, "one")],
        ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.pos, r.token_id)
        for r in S.bpe_encode_stream(docs).collect())
    mapped = T.byte_unicode_docs(docs)
    words = (mapped.select(
        F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("cnt")))
    vocab = T.bpe_word_tokens(words.select("word").distinct())
    ids = T.byte_bpe_ids(spark)
    want = sorted(
        (r.doc_id, r.pos, r.token_id)
        for r in T.bpe_encode_corpus(mapped, vocab, ids,
                                     unk_id=1).collect())
    assert got == want and len(got) > 0


def test_span_dedup_stream_matches_batch_rule(spark, sf_dir):
    """stream_c4_filters_spans (r12 verdict #9): on in-window
    single-batch replay the TTL'd first-occurrence state reproduces
    the batch window rule exactly — per-doc span/dup counts equal
    the (doc_id, pos)-first row_number derivation over the SAME
    c4_spans relation."""
    from pyspark.sql import Window

    from project_2_semantic_similarity_spark.plans.q_quality import (
        _c4_feat, c4_spans)

    got = {r.doc_id: (r.n_spans, r.n_dup_spans) for r in
           e.queries()["stream_c4_filters_spans"](spark, sf_dir)
           .collect()}
    punct = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.concat(F.regexp_replace(
            F.col("text"),
            r"(\S+ \S+ \S+ \S+ \S+) ", r"$1. "), F.lit("."))
         .alias("text"))
    spans = c4_spans(_c4_feat(punct))
    w = Window.partitionBy("sk").orderBy("doc_id", "pos")
    want = {r.doc_id: (r.n, r.n_dup) for r in
            spans.withColumn("rn", F.row_number().over(w))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                  .alias("n_dup")).collect()}
    assert got == want
    assert sum(n for n, _ in got.values()) > 0


def test_span_state_first_arrival_and_ttl_expiry():
    """The state fn's multi-batch semantics, driven directly: batch 2
    occurrences of a key seen in batch 1 are ALL duplicates
    (first-ARRIVAL-wins — the declared cross-batch approximation),
    and an expired key re-admits its next occurrence as non-dup."""
    import pandas as pd

    from project_2_semantic_similarity_spark.streaming.ops import (
        _span_mark_fn)

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    def run_batch(state, rows, **kw):
        pdfs = [pd.DataFrame(rows, columns=["doc_id", "pos"])]
        out = list(_span_mark_fn(("sk0",), iter(pdfs), state, **kw))
        if not out:
            return [], []
        return list(out[0]["doc_id"]), list(out[0]["is_dup"])

    st = FakeState()
    docs1, dup1 = run_batch(st, [(7, 0), (3, 2), (3, 0)])
    assert docs1 == [3, 3, 7]          # sorted by (doc_id, pos)
    assert dup1 == [False, True, True]  # (3,0) is the batch-rule first
    _, dup2 = run_batch(st, [(9, 1)])
    assert dup2 == [True]              # first-arrival-wins across batches
    # TTL expiry: the timeout callback must clear the first-seen
    # record and emit nothing
    st.hasTimedOut = True
    assert run_batch(st, []) == ([], [])
    assert not st.exists
    st.hasTimedOut = False
    _, dup3 = run_batch(st, [(11, 0)])
    assert dup3 == [False]             # re-admitted after expiry
    # the production TTL knob actually arms the timeout
    run_batch(st, [(12, 0)], ttl_minutes=30)
    assert st.timeout_ms == 30 * 60 * 1000


def test_exponential_histogram_merges_across_batches(spark, sf_dir):
    """r13 verdict #3 (test-coverage gap): stream_histogram_
    exponential's merge-by-addition property actually exercised
    across a micro-batch boundary — the doubled staging dir replayed
    with maxFilesPerTrigger=1 delivers the events in SEPARATE
    micro-batches, so bucket (n, sum) state must accumulate
    incrementally; the final complete-mode table must equal the
    batch GROUP BY over the same (doubled) rows: every n exactly 2x
    the single-corpus bucket count, sums additive."""
    from project_2_semantic_similarity_spark.plans.q_streaming import (
        _EXPHIST_M)
    from project_2_semantic_similarity_spark.sources import load_table

    d = S.stage_doubled_events_dir(sf_dir)
    ev = S.read_events_stream(spark, d, maxFilesPerTrigger="1")
    mat = S.run_to_memory(S.exponential_histogram(ev, _EXPHIST_M),
                          "exphist_2batch", "complete")
    got = {(r["event_type"], r["bucket_idx"]): (r["n"], r["sum_value"])
           for r in mat.collect()}

    events = load_table(spark, sf_dir, "events")
    batch = (events.filter(F.col("value").isNotNull()
                           & ~F.isnan("value") & (F.col("value") > 0))
             .select("event_type",
                     F.floor(F.log2("value") * _EXPHIST_M)
                      .cast("bigint").alias("bucket_idx"), "value")
             .groupBy("event_type", "bucket_idx")
             .agg(F.count("*").cast("bigint").alias("n"),
                  F.sum("value").alias("s")))
    want = {(r["event_type"], r["bucket_idx"]): (r["n"], r["s"])
            for r in batch.collect()}

    assert set(got) == set(want) and len(got) > 0
    for key, (n1, _) in want.items():
        assert got[key][0] == 2 * n1, key  # counts merged by addition
    # sums additive too: doubled-stream sum == 2x single sum (both
    # rounded once at the end, so compare at the cent the query emits)
    for key, (_, s1) in want.items():
        assert abs(got[key][1] - round(2 * s1, 2)) < 0.02, key


def test_replay_partitions_scale_adaptive(spark, sf_dir, tmp_path):
    """r14 opt: the replay partition count derives from staged source
    bytes (floor 2, ceiling the session default) and the replayed
    result is invariant to it."""
    import os

    src = S.stage_events_dir(sf_dir)
    session_default = int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    p = S.replay_partitions(spark, src)
    assert 2 <= p <= session_default
    # a few MB of events at 2 MiB/partition must coalesce well below
    # the 32-partition session default
    total = sum(f.stat().st_size for f in os.scandir(src)
                if f.is_file())
    assert p == max(2, min(session_default, -(-total // (2 << 20))))
    # ~1 GiB of claimed input saturates at the session ceiling
    big = tmp_path / "big.bin"
    big.write_bytes(b"\0" * (2 << 20))
    assert S.replay_partitions(
        spark, str(big), bytes_per_partition=1024) == session_default
    # env override wins
    os.environ["P2SS_STREAM_REPLAY_PARTITIONS"] = "5"
    try:
        assert S.replay_partitions(spark, src) == 5
    finally:
        del os.environ["P2SS_STREAM_REPLAY_PARTITIONS"]

    # result invariance: same rows whether replayed at 2 or default
    ev = S.read_events_stream(spark, src)
    at2 = S.run_to_memory(S.tumbling_counts(ev), "rp_probe_2",
                          "complete", shuffle_partitions=2)
    ev = S.read_events_stream(spark, src)
    atdef = S.run_to_memory(S.tumbling_counts(ev), "rp_probe_def",
                            "complete", shuffle_partitions=None)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(at2, *cols) == _rows(atdef, *cols)
    # the temporary conf value was restored
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) \
        == session_default


def test_ephemeral_ckpt_dir_hygiene(monkeypatch, tmp_path):
    """The memory-sink replay checkpoint lands under the ephemeral
    root when one is available, and the env kill-switch disables it."""
    import os

    root = tmp_path / "ckroot"
    monkeypatch.setenv("P2SS_EPHEMERAL_CKPT_DIR", str(root))
    d = S._ephemeral_ckpt_dir("probe")
    assert d is not None and d.startswith(str(root))
    assert os.path.isdir(d)
    mode = os.stat(root).st_mode & 0o777
    assert mode == 0o700
    monkeypatch.setenv("P2SS_EPHEMERAL_CKPT_DIR", "")
    assert S._ephemeral_ckpt_dir("probe") is None
