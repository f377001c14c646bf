"""Deterministic job/stage/task/shuffle accounting per registered query.

Wall-clock on this shared host jitters by up to 4x, so before/after
evidence for harness-level optimizations (fewer sequential jobs, fewer
duplicate passes) is better stated in SCHEDULER COUNTS, which are
deterministic for a fixed plan and SF. This runs each named query once
(after a warm pass at sf0.001 so codegen/JIT jobs don't pollute the
counts) with the Spark event log enabled, then parses the log:

    python tools/count_jobs.py <query> [<query> ...]

Jobs are bucketed per query by submission-time interval (job
descriptions are thread-local and concurrent sink jobs carry none).
Prints one JSON line:

    {query: {"jobs": J, "stages": S, "tasks": T,
             "input_mb": MB, "shuffle_write_mb": MB}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_osmosis_spark.operators import QUERIES, load_all  # noqa: E402
from dbt_osmosis_spark.operators.caching import release_caches  # noqa: E402
from dbt_osmosis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    log_dir = tempfile.mkdtemp(prefix="sg-eventlog-")
    load_all()
    spark = get_spark(
        app_name="count-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    for name in names:  # warm: codegen/broadcast jobs out of the counts
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()
    release_caches()
    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        t0 = time.time() * 1000
        QUERIES[name](spark, SF_DIR).collect()
        spans[name] = (t0, time.time() * 1000)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)  # event log flush
    out = {
        n: {"jobs": 0, "stages": 0, "tasks": 0, "input_mb": 0.0, "shuffle_write_mb": 0.0}
        for n in names
    }

    def bucket(ts: float):
        for n, (a, b) in spans.items():
            if a <= ts <= b:
                return out[n]
        return None

    # Spark 4 writes a rolling v2 event log DIRECTORY
    # (eventlog_v2_<appId>/events_N_<appId>); older layouts a flat file.
    cand = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(cand):
        files = sorted(
            os.path.join(cand, f)
            for f in os.listdir(cand)
            if f.startswith("events_")
        )
    else:
        files = [os.path.join(log_dir, app_id)]
    for line in (line for f in files for line in open(f)):
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                b = bucket(ev["Submission Time"])
                if b is not None:
                    b["jobs"] += 1
                    b["stages"] += len(ev.get("Stage Infos", []))
            elif kind == "SparkListenerTaskEnd":
                info = ev.get("Task Info") or {}
                b = bucket(info.get("Launch Time", 0))
                if b is not None:
                    b["tasks"] += 1
                    m = ev.get("Task Metrics") or {}
                    b["input_mb"] += (m.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    ) / 1e6
                    b["shuffle_write_mb"] += (
                        (m.get("Shuffle Write Metrics") or {}).get(
                            "Shuffle Bytes Written", 0
                        )
                    ) / 1e6
    for n in out:
        out[n]["input_mb"] = round(out[n]["input_mb"], 1)
        out[n]["shuffle_write_mb"] = round(out[n]["shuffle_write_mb"], 1)
    print(json.dumps(out))
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
