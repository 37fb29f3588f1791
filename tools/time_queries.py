#!/usr/bin/env python
"""Ad-hoc per-query timer: fresh session, cold + N warm passes per
name, one JSON line per name. Usage:

    python tools/time_queries.py <sf_dir> name1,name2,... [warm_passes]

Used by the bench-triage workflow (BENCH_TRIAGE.md) for isolation
retimes — same noop-sink protocol as bench.py, but a dedicated
process per invocation so the 301-query sweep's session pressure
can't leak into the numbers.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from project_2_semantic_similarity_spark.session import get_spark
    from project_2_semantic_similarity_spark.plans import registry
    registry.load_all()
    spark = get_spark("time_queries")

    out = {}
    for name in names:
        fn = registry.ordered_queries()[name]

        def run() -> float:
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            return time.monotonic() - t0

        cold = run()
        warms = [run() for _ in range(warm)]
        out[name] = {"cold": round(cold, 3),
                     "warm_median": round(statistics.median(warms), 3),
                     "warms": [round(w, 3) for w in warms]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
