"""Per-PHASE job/stage/task counts for the lifecycle operators.

Couples tools/profile_lifecycle.py's phase replays with the event-log
accounting of tools/count_jobs.py: each phase's (t0, t1) wall interval
buckets the JobStart/TaskEnd events, so the 100+ jobs these operators
submit are attributed to ingest/delete/compact/serve phases. Usage::

    python tools/phase_jobs.py s53 s44 s55
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.profile_lifecycle as pl  # noqa: E402
from dbt_osmosis_spark.operators import load_all  # noqa: E402
from dbt_osmosis_spark.operators.caching import release_caches  # noqa: E402
from dbt_osmosis_spark.session import get_spark  # noqa: E402


class TimedPhases(pl.Phases):
    def __init__(self, spark):
        super().__init__(spark)
        self.spans = []

    def run(self, label, fn):
        t0 = time.time() * 1000
        out = super().run(label, fn)
        self.spans.append((label, t0, time.time() * 1000))
        return out


def main() -> None:
    names = sys.argv[1:] or ["s53", "s44", "s55"]
    log_dir = tempfile.mkdtemp(prefix="sg-phasejobs-")
    load_all()
    spark = get_spark(
        app_name="phase-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    pl.Phases = TimedPhases  # profiles instantiate via the module global
    for n in names:  # warm at the smallest SF
        pl.SF_DIR = "/root/testdata/sf0.001"
        pl.PROFILES[n](spark)
        release_caches()
    pl.SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spans: list[tuple[str, str, float, float, float]] = []
    for n in names:
        release_caches()
        p = TimedPhases(spark)
        orig = pl.Phases
        pl.Phases = lambda s, _p=p: _p  # hand the profile OUR collector
        try:
            pl.PROFILES[n](spark)
        finally:
            pl.Phases = orig
        for (label, t0, t1), (_, sec) in zip(p.spans, p.t):
            spans.append((n, label, t0, t1, sec))
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    counts = {(n, lab): {"jobs": 0, "tasks": 0} for n, lab, *_ in spans}

    def bucket(ts):
        for n, lab, a, b, _ in spans:
            if a <= ts <= b:
                return counts[(n, lab)]
        return None

    d = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    files = (
        sorted(os.path.join(d, f) for f in os.listdir(d) if f.startswith("events_"))
        if os.path.isdir(d)
        else [os.path.join(log_dir, app_id)]
    )
    for f in files:
        for line in open(f):
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                b = bucket(ev["Submission Time"])
                if b is not None:
                    b["jobs"] += 1
            elif kind == "SparkListenerTaskEnd":
                b = bucket((ev.get("Task Info") or {}).get("Launch Time", 0))
                if b is not None:
                    b["tasks"] += 1
    for n, lab, _a, _b, sec in spans:
        c = counts[(n, lab)]
        print(f"{n}  {sec:7.3f}s  jobs={c['jobs']:3d} tasks={c['tasks']:5d}  {lab}")
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
