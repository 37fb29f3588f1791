#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line

    {"metric": ..., "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Baseline context (BASELINE.md): the reference runs single-threaded
(`SparkContext("local")`) at ~15.7k tokens/s on the flagship TF-IDF
similarity query; the bench criterion is staying within 2x of that at
the same scale. Each query is forced end-to-end with a noop sink
(full execution, no driver-side materialization cost in the timing).
The flagship is timed cold (first action after session start, plan
compilation included) and warm; `value` sums the per-query warm-path
timings, which is the honest cluster-side number.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Representative query per operator family (SURVEY.md section 2.B) --
# the full inventory runs under tools/verify_local.py; bench tracks
# the scale-sensitive paths.
HEADLINE = [
    "flagship_term_similarity",  # the reference's whole surface
    "text_tfidf",                # tokenize -> explode -> window aggs
    "text_ngrams",               # per-doc sequence windows
    "agg_hash",                  # TPC-H Q1 shape on lineitem
    "join_multiway",             # region->nation->customer->orders->lineitem
    "join_asof",                 # window-over-candidates as-of join
    "win_running",               # running sum over orders
    "topk",                      # TakeOrderedAndProject
    "dedup_exact",               # sha2 groupBy on documents
    "dedup_minhash",             # shingle -> minhash -> LSH bands
    "knn_embeddings",            # brute-force cosine top-k
    "text_quality_score",        # text-analysis built-in pipeline
    "stream_tumbling_count",     # availableNow replay, stateful agg
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.session import get_spark

    t_session = time.perf_counter()
    spark = get_spark("bench")
    session_startup = time.perf_counter() - t_session

    qs = e.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold_flagship = run("flagship_term_similarity")

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        times[name] = round(run(name), 3)

    total = round(sum(times.values()), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    print(json.dumps({
        "metric": "headline_queries_total_warm",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cold_flagship_sec": round(cold_flagship, 3),
        "session_startup_sec": round(session_startup, 3),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
