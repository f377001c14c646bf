"""Source freshness — the `dbt source freshness` analog on Spark.

Each source with a `loaded_at_field` + `freshness` block in sources.yml
gets one MAX(loaded_at) aggregate; the age against `warn_after` /
`error_after` ({count, period}) thresholds yields pass/warn/error —
dbt's exact status contract.

Scale: MAX over an event-time column is footer-answerable — with
`spark.sql.parquet.aggregatePushdown=on` Spark serves the aggregate from
parquet row-group statistics without scanning data pages, so a freshness
sweep over a 100 TB landing zone reads metadata only. The conf is set
per-check and restored (it only applies to non-nested columns; the scan
falls back gracefully when a filter/complex type blocks pushdown).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dbt_osmosis_spark.project import Manifest

_PERIOD_SECONDS = {"minute": 60.0, "hour": 3600.0, "day": 86400.0}


@dataclass
class FreshnessResult:
    source: str
    max_loaded_at: datetime | None
    age_seconds: float | None
    status: str  # pass | warn | error (error also covers empty sources)

    @property
    def passed(self) -> bool:
        return self.status == "pass"


def _threshold_seconds(spec: dict | None) -> float | None:
    if not spec:
        return None
    period = spec.get("period", "hour")
    if period not in _PERIOD_SECONDS:
        raise ValueError(f"unknown freshness period: {period!r}")
    return float(spec.get("count", 1)) * _PERIOD_SECONDS[period]


def check_freshness(
    spark: SparkSession,
    manifest: Manifest,
    now: datetime | None = None,
) -> list[FreshnessResult]:
    """One result per freshness-configured source. `now` pins the clock
    for deterministic replays/tests; default is wall clock."""
    from dbt_osmosis_spark.sources.registry import read_source

    now = now or datetime.now()
    results: list[FreshnessResult] = []
    prev = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        for key, src in manifest.sources.items():
            if not src.loaded_at_field or not src.freshness:
                continue
            if src.path is None:
                # declared-only source (no file location): the user asked
                # for a staleness monitor but the engine cannot read the
                # relation — report an error row, never silently drop it
                results.append(FreshnessResult(key, None, None, "error"))
                continue
            df = read_source(spark, src.path, src.format)
            max_ts = df.agg(F.max(src.loaded_at_field).alias("m")).first().m
            if max_ts is None:
                results.append(FreshnessResult(key, None, None, "error"))
                continue
            age = (now - max_ts).total_seconds()
            warn = _threshold_seconds(src.freshness.get("warn_after"))
            error = _threshold_seconds(src.freshness.get("error_after"))
            status = "pass"
            if error is not None and age > error:
                status = "error"
            elif warn is not None and age > warn:
                status = "warn"
            results.append(FreshnessResult(key, max_ts, age, status))
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev)
    return results
