"""Full-registry oracle sweep under a DRIVER-LIKE SparkSession.

The driver's verify harness builds its own SparkSession with Spark 4
defaults — crucially ``spark.sql.parquet.inferTimestampNTZ.enabled=true``,
so parquet timestamps read as TIMESTAMP_NTZ, unlike the engine's own
session (session.py pins the legacy TIMESTAMP read). Round 7 proved the
gap matters: q55/q65/q66 failed only under the driver's session
(unix_micros is LTZ-only).

This sweep runs every registered query against DuckDB with a session that
mimics the driver: default parquet timestamp inference, UTC timezone,
AQE defaults. Usage:

    python tools/driver_session_sweep.py [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import SparkSession

    from dbt_osmosis_spark.operators import QUERIES, load_all
    from dbt_osmosis_spark.oracle import check_parity, duckdb_connect

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    load_all()
    names = sys.argv[1:] or sorted(QUERIES)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_session_sweep")
        # deliberately NO inferTimestampNTZ override: Spark 4 default (true)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true"

    con = duckdb_connect(sf_dir)
    failed = []
    for i, name in enumerate(names):
        try:
            r = check_parity(spark, name, sf_dir, con)
            ok, issues = r.ok, r.issues
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            ok, issues = False, [f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"]
        if not ok:
            failed.append(name)
            print(f"FAIL {name}")
            for issue in issues:
                print(f"     {issue}")
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)} done, {len(failed)} failed", flush=True)
    print(f"{len(names) - len(failed)}/{len(names)} green under driver-like session")
    if failed:
        print("failed:", " ".join(failed))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
