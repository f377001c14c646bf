"""Time a subset of registered queries with the bench's methodology.

Same discipline as bench.py (warm once at sf0.001, best-of-N reps x 2
time-separated blocks, host probe) for quick before/after measurement of
a few queries without a full bench run. Usage::

    python tools/time_queries.py q1 q2 ...

Prints one JSON line {name: best_sec, ...} plus the per-rep spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_osmosis_spark.operators import QUERIES, load_all  # noqa: E402
from dbt_osmosis_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    blocks = int(os.environ.get("SPARK_GRAFT_BENCH_BLOCKS", "2"))
    load_all()
    spark = get_spark(app_name="time-queries")
    with open("/proc/loadavg") as fh:
        load_before = fh.read().split()[:3]
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()
    rep_times: dict[str, list[float]] = {}
    best: dict[str, float] = dict.fromkeys(names, float("inf"))
    for _ in range(blocks):
        for name in names:
            for _ in range(reps):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                rep_times.setdefault(name, []).append(dt)
                best[name] = min(best[name], dt)
    with open("/proc/loadavg") as fh:
        load_after = fh.read().split()[:3]
    print(json.dumps({n: round(v, 3) for n, v in best.items()}))
    print(
        json.dumps(
            {
                "spread": {
                    n: [round(min(v), 3), round(sorted(v)[len(v) // 2], 3), round(max(v), 3)]
                    for n, v in rep_times.items()
                },
                "loadavg": {"before": load_before, "after": load_after},
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
