"""Model dry-run validation (SURVEY M29, S21).

The reference compiles + executes each model with a best-effort SIGALRM
timeout, reporting status / seconds / row count (reference:
src/dbt_osmosis/core/validation.py:136-388). Spark job groups are strictly
better: `setJobGroup` + a timer that calls `cancelJobGroup` cancels the
distributed job itself, not just the driver thread.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

from dbt_osmosis_spark.compile import JinjaCompiler
from dbt_osmosis_spark.project import Manifest


@dataclass
class ValidationResult:
    model: str
    status: str  # success | error | timeout
    seconds: float
    row_count: int | None = None
    error: str | None = None


def validate_model(
    spark: SparkSession,
    manifest: Manifest,
    model: str,
    timeout_seconds: float | None = None,
) -> ValidationResult:
    """Compile and execute the model's SQL without materializing — count
    rows, time it, cancel on timeout."""
    compiler = JinjaCompiler(manifest)
    t0 = time.perf_counter()
    node = manifest.models[model]
    if node.language == "python":
        # python models validate by building (not materializing) the frame
        from dbt_osmosis_spark.runner import _run_python_model

        try:
            n = _run_python_model(spark, node).count()
            return ValidationResult(model, "success", time.perf_counter() - t0, row_count=n)
        except Exception as e:
            return ValidationResult(
                model, "error", time.perf_counter() - t0, error=str(e)[:500]
            )
    try:
        compiled = compiler.compile(node.raw_sql)
    except Exception as e:  # compile error
        return ValidationResult(model, "error", time.perf_counter() - t0, error=str(e))

    group = f"validate-{model}-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    cancel_timer: threading.Timer | None = None
    timed_out = threading.Event()
    if timeout_seconds:
        def _cancel():
            timed_out.set()
            sc.cancelJobGroup(group)

        cancel_timer = threading.Timer(timeout_seconds, _cancel)
        cancel_timer.daemon = True
        cancel_timer.start()
    sc.setJobGroup(group, f"validate {model}", interruptOnCancel=True)
    try:
        n = spark.sql(compiled.compiled_sql).count()
        return ValidationResult(model, "success", time.perf_counter() - t0, row_count=n)
    except Exception as e:
        status = "timeout" if timed_out.is_set() else "error"
        return ValidationResult(model, status, time.perf_counter() - t0, error=str(e)[:500])
    finally:
        if cancel_timer:
            cancel_timer.cancel()
        sc.setJobGroup("", "")


def validate_models(
    spark: SparkSession,
    manifest: Manifest,
    timeout_seconds: float | None = None,
) -> list[ValidationResult]:
    """Validate every model in dependency order (parents registered first
    by the runner; here we only execute, so order is for readability)."""
    return [
        validate_model(spark, manifest, m, timeout_seconds)
        for m in manifest.topo_sort()
    ]
