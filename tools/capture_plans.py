"""Capture .explain("formatted") output for registered queries.

Round-13 deliverable helper: writes ``plans/r13/<query>_<suffix>.txt``
for each named query so the judge can check plan claims without running
Spark. Usage::

    python tools/capture_plans.py <suffix> <query> [<query> ...]

``$SPARK_GRAFT_SF_DIR`` picks the data directory (default sf0.1 — the
bench scale, so the captured join strategies match the benched plans).
Building the DataFrame may run real jobs (index builds, BPE training
collects); that is the cost of capturing the exact serve plan the bench
times. A one-line summary (exchange count, join strategies) is appended
to each file.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_osmosis_spark.operators import QUERIES, load_all  # noqa: E402
from dbt_osmosis_spark.plans.audit import formatted_plan  # noqa: E402
from dbt_osmosis_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    load_all()
    spark = get_spark(app_name=f"capture-plans-{suffix}")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # capture must not die mid-list
            plan = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
        # formatted-plan node syntax: "(12) Exchange" is a shuffle;
        # broadcasts print as "BroadcastExchange" (a different token).
        n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
        joins = sorted(
            set(
                re.findall(
                    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)",
                    plan,
                )
            )
        )
        summary = (
            f"== summary: sf_dir={sf_dir} shuffle_exchanges={n_exch} "
            f"join_nodes={joins or ['none']} =="
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(summary + "\n\n" + plan + "\n")
        print(f"{name}: {summary}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
