"""Local approximation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir,
executes the matching ``oracle_sql()`` in DuckDB over the same parquet
files, and compares row count + schema + order-insensitive value hash.

The DuckDB oracle runs in its OWN PROCESS with an explicit memory and
thread budget (r12 verdict #8): inside a 301-query single-process
sweep the brute-force differential oracles (doc-similarity is O(pairs)
SQL by design) competed with the in-process Spark JVM's heap/page
cache, inflating VERIFY walls 2.4x over the engine-side sweep and
making the artifact unreadable as an engine signal. Isolation also
means an oracle OOM/crash records as that query's "duckdb error"
instead of killing the sweep. Per-query walls are now recorded SPLIT
(`spark_sec` / `oracle_sec`) so the artifact itself shows which side
any wall lives on.

With no name filter (a full sweep), also writes
``VERIFY_LOCAL_r{N}.json`` to the repo root — per-query status, rows
and wall seconds for the WHOLE registry, so the judge sees every
round's full-inventory state, not just the driver's ~50-name window
(r5 VERDICT #7). N = current round, inferred as newest
CORRECTNESS_r*.json round + 1 (override: $SPARK_GRAFT_ROUND).

Usage: python tools/verify_local.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import glob
import hashlib
import json
import multiprocessing as mp
import os
import re
import sys
import time
import traceback

import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

# The oracle process budget: enough for the brute-force O(pairs)
# doc-similarity CTEs at sf0.1, small enough to leave the Spark JVM's
# heap and the page cache alone on a 128 GiB box.
ORACLE_MEMORY = os.environ.get("P2SS_ORACLE_MEM", "32GB")
ORACLE_THREADS = int(os.environ.get("P2SS_ORACLE_THREADS", "8"))
# Per-query ceiling (r13 ADVICE): a hung-but-alive oracle (thrashing
# under the memory_limit without being OOM-killed) must not stall the
# sweep — poll with a generous budget, then terminate+restart and
# record a duckdb error, mirroring the crash path. The ceiling is
# sized to the slowest observed oracle (text_doc_similarity_ann,
# 973 s at sf0.1 pre-materialization) with ~2x headroom.
ORACLE_TIMEOUT = float(os.environ.get("P2SS_ORACLE_TIMEOUT", "2400"))


# Harness-side oracle acceleration (r13 verdict #2): curated
# ``AS MATERIALIZED`` hints for multiply-referenced CTEs in the heavy
# differential oracles — DuckDB 1.0 inlines every CTE reference, and
# inside a RECURSIVE member the referenced relation is re-evaluated
# per iteration STEP, which is where the unigram Viterbi oracles
# burned their wall. Applied ONLY in this harness; the registry's
# oracle strings (what the driver runs standalone) are untouched, and
# the hint is result-identical by DuckDB contract (it only pins the
# evaluate-once strategy).
#
# Every entry is A/B-validated on a QUIET box at sf0.1 (r14,
# /tmp/ab2.log + ab3.log): unigram_tokenize 36.7 -> 1.3 s,
# unigram_train 51.5 -> 0.2 s, phash_clusters 438.9 -> 248.1 s,
# doc_similarity 34.4 -> 24.6 s. text_doc_similarity_ann is
# deliberately ABSENT — hinting its wnz/buckets/norms SLOWED it
# (92 -> 157-200 s: forced materialization defeats the planner's
# pushdown there), as did a shared tfidf temp table for every
# _TFIDF_CTES consumer (the r13 verdict's suggested staging — tried,
# measured slower, dropped; the r13 sweep's 973 s ann reading was
# sweep-environment pressure, not CTE recomputation).
_MATERIALIZE_CTES = {
    "text_doc_similarity": ("norms",),
    "dedup_phash_clusters": ("g", "ph", "edges"),
    "text_unigram_tokenize": ("words", "vocab", "cost",
                              "pieces", "seg"),
    "text_unigram_train": ("words", "vocab", "wf", "seedf",
                           "chars", "cost1", "cost2",
                           "seg1", "seg2"),
}


def _rewrite_oracle(name: str, sql: str) -> str:
    for cte in _MATERIALIZE_CTES.get(name, ()):
        sql = re.sub(rf"(?<![A-Za-z0-9_]){cte} AS \(",
                     f"{cte} AS MATERIALIZED (", sql, count=1)
    return sql


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        rows.append("\x1f".join(norm_cell(v) for v in t))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def _oracle_worker(conn, sf_dir: str) -> None:
    """The oracle subprocess loop: ("run", name, sql) -> ("ok",
    (n, cols, hash)) or ("err", traceback); ("head",) -> the last
    result's sorted 5-row head (failure diagnostics, computed only
    on demand); None -> exit."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{ORACLE_MEMORY}'")
    con.execute(f"SET threads={ORACLE_THREADS}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    last: pd.DataFrame | None = None
    while True:
        msg = conn.recv()
        if msg is None:
            conn.close()
            return
        if msg[0] == "head":
            if last is None:
                conn.send("<no result>")
            else:
                d = last.sort_values(sorted(last.columns)) \
                    .reset_index(drop=True)
                conn.send(d.head(5).to_string())
            continue
        _, name, sql = msg
        try:
            last = con.execute(sql).fetchdf()
            conn.send(("ok", frame_fingerprint(last)))
        except Exception:
            last = None
            conn.send(("err", traceback.format_exc()))


class OracleProc:
    """Owner of the oracle subprocess; restarts it after a crash so
    one oracle OOM doesn't take down the rest of the sweep, and
    applies a per-query poll ceiling so a hung-but-alive oracle
    (thrashing under the memory_limit) can't stall the sweep
    (r13 ADVICE)."""

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._start()

    def _start(self) -> None:
        ctx = mp.get_context("spawn")  # never fork the JVM-attached parent
        self.conn, child = ctx.Pipe()
        self.proc = ctx.Process(target=_oracle_worker,
                                args=(child, self.sf_dir), daemon=True)
        self.proc.start()
        child.close()

    def _recv(self, timeout: float):
        """recv with a ceiling; None = timed out (caller restarts)."""
        if not self.conn.poll(timeout):
            return None
        return self.conn.recv()

    def _kill(self) -> None:
        try:
            self.proc.terminate()
        except Exception:
            pass
        self.proc.join(timeout=10)
        try:
            self.conn.close()
        except OSError:
            pass

    def run(self, name: str, sql: str):
        sql = _rewrite_oracle(name, sql)
        try:
            self.conn.send(("run", name, sql))
            got = self._recv(ORACLE_TIMEOUT)
        except (EOFError, BrokenPipeError, OSError):
            code = self.proc.exitcode
            self.proc.join(timeout=5)
            self._start()
            return ("err", f"oracle process died (exitcode={code})")
        if got is None:
            self._kill()
            self._start()
            return ("err", f"oracle timed out (> {ORACLE_TIMEOUT:.0f}s)")
        return got

    def head(self) -> str:
        try:
            self.conn.send(("head",))
            got = self._recv(ORACLE_TIMEOUT)
        except (EOFError, BrokenPipeError, OSError):
            self._start()
            return "<oracle process died fetching head>"
        if got is None:
            self._kill()
            self._start()
            return "<oracle timed out fetching head>"
        return got

    def close(self) -> None:
        try:
            self.conn.send(None)
        except (BrokenPipeError, OSError):
            pass
        self.proc.join(timeout=10)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import __spark_entry__ as e
    from project_2_semantic_similarity_spark.session import get_spark

    # Full sweeps record per-query walls the judge reads — apply the
    # same start gate as bench.py (r10 verdict #3: sweeps started on
    # a box the previous JVM was still winding down read 2-5x slow).
    if not filters:
        import bench
        gate = bench._wait_for_quiet()
        print(f"load gate: {gate}")
    else:
        gate = None

    spark = get_spark("verify_local")
    qs, oracles = e.queries(), e.oracle_sql()
    oracle = OracleProc(sf_dir)

    failed = []
    records: dict[str, dict] = {}
    # fixed name order: e.queries() rotates with the driver tiers,
    # which put different names in the cold part of the session each
    # round and made per-query walls incomparable (r11 finding)
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            records[name] = {"status": "err", "err": "spark error",
                             "sec": round(time.time() - t0, 3)}
            continue
        s_n, s_cols, s_h = frame_fingerprint(sdf)
        t_spark = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if s_n >= 0 else "??"
            print(f"{status:9s} {name}: rows={s_n} ({t_spark:.1f}s)")
            records[name] = {"status": "rows_only", "rows": s_n,
                             "sec": round(t_spark, 3),
                             "spark_sec": round(t_spark, 3)}
            continue
        t1 = time.time()
        verdict = oracle.run(name, oracles[name])
        t_oracle = time.time() - t1
        if verdict[0] == "err":
            print(f"FAIL  {name}: duckdb error\n{verdict[1]}")
            failed.append(name)
            records[name] = {"status": "err", "err": "duckdb error",
                             "sec": round(time.time() - t0, 3),
                             "spark_sec": round(t_spark, 3),
                             "oracle_sec": round(t_oracle, 3)}
            continue
        o_n, o_cols, o_h = verdict[1]
        ok = (s_n, s_cols, s_h) == (o_n, o_cols, o_h)
        tag = "OK   " if ok else "FAIL "
        print(f"{tag} {name}: spark(n={s_n},h={s_h}) duck(n={o_n},h={o_h}) "
              f"({time.time()-t0:.1f}s)")
        records[name] = {"status": "pass" if ok else "fail",
                         "rows": s_n, "hash": s_h,
                         "sec": round(time.time() - t0, 3),
                         "spark_sec": round(t_spark, 3),
                         "oracle_sec": round(t_oracle, 3)}
        if not ok:
            failed.append(name)
            if s_cols != o_cols:
                print(f"      cols spark={s_cols} duck={o_cols}")
            if s_n == o_n and s_cols == o_cols:
                m = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
                print("      spark head:\n", m.head(5).to_string())
                print("      duck  head:\n", oracle.head())
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    oracle.close()
    if not filters:
        write_artifact(sf_dir, records, failed, gate)
    return 1 if failed else 0


def current_round() -> int:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    # PROGRESS.jsonl carries the driver's authoritative round number;
    # fall back to newest correctness artifact + 1.
    try:
        with open("/root/repo/PROGRESS.jsonl") as fh:
            lines = fh.read().splitlines()
        for ln in reversed(lines):
            rec = json.loads(ln)
            if "round" in rec:
                return int(rec["round"])
    except (OSError, ValueError):
        pass
    rounds = [int(m.group(1))
              for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def write_artifact(sf_dir: str, records: dict, failed: list,
                   load_gate: dict | None = None) -> None:
    n = current_round()
    path = f"/root/repo/VERIFY_LOCAL_r{n:02d}.json"
    statuses = [r["status"] for r in records.values()]
    out = {
        "sf_dir": sf_dir,
        "order": "sorted-name",
        "load_gate": load_gate,
        "oracle_isolation": {"memory_limit": ORACLE_MEMORY,
                             "threads": ORACLE_THREADS,
                             "timeout_sec": ORACLE_TIMEOUT,
                             "process": "spawned, restart-on-crash",
                             "staging": "per-query AS MATERIALIZED "
                                        "hints, A/B-validated "
                                        "(harness-side; registry "
                                        "oracle SQL untouched)"},
        "total": len(records),
        "pass": statuses.count("pass"),
        "rows_only": statuses.count("rows_only"),
        "fail": statuses.count("fail") + statuses.count("err"),
        "failed_names": failed,
        "total_sec": round(sum(r["sec"] for r in records.values()), 1),
        "spark_sec": round(sum(r.get("spark_sec", 0)
                               for r in records.values()), 1),
        "oracle_sec": round(sum(r.get("oracle_sec", 0)
                                for r in records.values()), 1),
        "queries": records,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {out['pass']} pass / "
          f"{out['rows_only']} rows-only / {out['fail']} fail "
          f"(spark {out['spark_sec']}s / oracle {out['oracle_sec']}s)")


if __name__ == "__main__":
    raise SystemExit(main())
