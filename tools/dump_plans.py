#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Usage:
    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> name1,name2,...
    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> ALL

Writes ``<out_dir>/<name>_<suffix>.txt`` per query (suffix is
"before" / "after" for the optimization-round evidence trail).
The plan is the STATIC plan (pre-AQE); a trailing summary line
counts Exchange / BatchEvalPython / ArrowEvalPython occurrences so
diffs are scannable.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    sf_dir, out_dir, suffix, names_arg = sys.argv[1:5]
    os.makedirs(out_dir, exist_ok=True)

    from project_2_semantic_similarity_spark.session import get_spark
    from project_2_semantic_similarity_spark.plans import registry
    registry.load_all()
    spark = get_spark("dump_plans")
    qs = registry.ordered_queries()
    names = sorted(qs) if names_arg == "ALL" else names_arg.split(",")

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record, keep going
            plan = f"ERROR building plan: {exc!r}\n"
        counts = {
            "Exchange": len(re.findall(r"\bExchange\b", plan)),
            "BatchEvalPython": plan.count("BatchEvalPython"),
            "ArrowEvalPython": plan.count("ArrowEvalPython"),
            "MapInPandas/Arrow": (plan.count("MapInPandas")
                                  + plan.count("MapInArrow")
                                  + plan.count("FlatMapGroupsInPandas")),
            "SortMergeJoin": plan.count("SortMergeJoin"),
            "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
            "ShuffledHashJoin": plan.count("ShuffledHashJoin"),
        }
        summary = "SUMMARY " + " ".join(
            f"{k}={v}" for k, v in counts.items())
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
            fh.write("\n" + summary + "\n")
        print(f"{name}: {summary}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
