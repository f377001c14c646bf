"""Executable schema data tests — the `dbt test` analog on Spark.

The reference mines and suggests column tests (SURVEY M31) and validates
their YAML configuration (M37) but delegates execution to dbt-core + the
warehouse. Here the same four built-in tests run natively as Spark
assertion queries; each returns the number of VIOLATING rows (0 = pass),
exactly dbt's contract.

Scale notes: every test is a single aggregate over the relation —
`unique` is one groupBy(key) with a HAVING count>1 (map-side partial
aggregation applies), `relationships` is a left-anti join (broadcastable
when the parent is a dim). No test collects rows to the driver; failures
report counts plus a bounded sample.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DataTestResult:
    model: str
    column: str | None
    test: str
    violations: int
    sample: list = field(default_factory=list)
    stored_at: str | None = None  # store_failures artifact path
    # dbt severity contract: "pass" | "warn" | "fail" from the test's
    # severity / warn_if / error_if config; "error" = the test itself is
    # misconfigured (e.g. a malformed threshold) — that ONE test errors
    # with a message, the rest of the command still runs
    status: str = "pass"
    message: str | None = None

    @property
    def passed(self) -> bool:
        """Gate result — warnings do not fail a run (dbt semantics)."""
        return self.status not in ("fail", "error")


def _violations_df(
    spark: SparkSession, relation: str, column: str | None, test: str, config: dict
) -> DataFrame:
    df = spark.table(relation)
    if test == "not_null":
        return df.filter(F.col(column).isNull())
    if test == "unique":
        return (
            df.filter(F.col(column).isNotNull())
            .groupBy(column)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
    if test == "accepted_values":
        values = config.get("values") or []
        return df.filter(~F.col(column).isin(values) & F.col(column).isNotNull())
    if test == "relationships":
        to, fld = config["to"], config["field"]
        parent = spark.table(to).select(F.col(fld).alias(column)).distinct()
        # No forced broadcast: a fact-to-fact FK's parent key set can exceed
        # executor memory, and an explicit hint bypasses
        # autoBroadcastJoinThreshold. AQE picks broadcast when the distinct
        # key set is actually small (the dim case) from runtime stats.
        return (
            df.filter(F.col(column).isNotNull())
            .select(column)
            .join(parent, column, "left_anti")
        )
    raise ValueError(f"unknown test: {test}")


def _threshold_met(n: int, expr: str) -> bool:
    """dbt's warn_if/error_if condition strings ("!=0", ">10", ">=5").

    A malformed threshold (">=1.5", ">ten") is a CONFIG error naming the
    bad value — never a bare ValueError mid-run that aborts the whole test
    command with no pointer at the offending condition string."""
    expr = str(expr).replace(" ", "")
    for op in ("!=", ">=", "<=", "==", ">", "<"):
        if expr.startswith(op):
            try:
                v = int(expr[len(op):])
            except ValueError as exc:
                raise ValueError(
                    f"invalid warn_if/error_if threshold {expr!r}: the value "
                    f"after {op!r} must be an integer"
                ) from exc
            return {
                "!=": n != v, ">=": n >= v, "<=": n <= v,
                "==": n == v, ">": n > v, "<": n < v,
            }[op]
    return n != 0


def _test_status(n: int, config: dict) -> str:
    """dbt severity semantics: severity='error' (default) fails when
    error_if (default "!=0") holds; severity='warn' — or a failed error_if
    with warn_if holding — warns."""
    severity = str(config.get("severity", "error")).lower()
    error_if = config.get("error_if", "!=0")
    warn_if = config.get("warn_if", "!=0")
    if severity == "error" and _threshold_met(n, error_if):
        return "fail"
    if _threshold_met(n, warn_if) and n:
        return "warn"
    return "pass"


def run_test(
    spark: SparkSession,
    relation: str,
    column: str | None,
    test: str,
    config: dict | None = None,
    sample: int = 5,
    store_failures_dir: str | None = None,
) -> DataTestResult:
    bad = _violations_df(spark, relation, column, test, config or {})
    head = bad.limit(sample).collect()
    n = bad.count() if len(head) == sample else len(head)
    stored = None
    if store_failures_dir and n:
        # dbt store_failures: persist the full violating-row set as a
        # queryable artifact (debug joins against it instead of re-running
        # the test query)
        import os

        stored = os.path.join(
            store_failures_dir, f"{relation}__{column or 'model'}__{test}.parquet"
        )
        bad.write.mode("overwrite").parquet(stored)
    try:
        status, message = _test_status(n, config or {}), None
    except ValueError as exc:
        # misconfigured severity thresholds fail THIS test with a named
        # config error; they must not abort the whole test command
        status, message = "error", f"{test} on {relation}: {exc}"
    return DataTestResult(
        model=relation,
        column=column,
        test=test,
        violations=n,
        sample=[tuple(r) for r in head],
        stored_at=stored,
        status=status,
        message=message,
    )


def _iter_yaml_tests(entry: dict):
    """Yield (column, test_name, config) from a model's YAML doc entry
    (column-level and model-level `tests` / `data_tests` keys)."""
    for col in entry.get("columns") or []:
        for key in ("tests", "data_tests"):
            for t in col.get(key) or []:
                if isinstance(t, str):
                    yield col["name"], t, {}
                elif isinstance(t, dict) and len(t) == 1:
                    name, cfg = next(iter(t.items()))
                    yield col["name"], name, dict(cfg or {})


def run_model_tests(
    spark: SparkSession,
    model: str,
    entry: dict,
    relation: str | None = None,
    store_failures_dir: str | None = None,
) -> list[DataTestResult]:
    """Run every test declared in a model's YAML entry against its live
    relation."""
    out = []
    for column, test, cfg in _iter_yaml_tests(entry):
        out.append(
            run_test(
                spark, relation or model, column, test, cfg,
                store_failures_dir=store_failures_dir,
            )
        )
    return out


def run_project_tests(
    spark: SparkSession,
    ctx,
    store_failures_dir: str | None = None,
    skip_models: set[str] | None = None,
) -> list[DataTestResult]:
    """All declared tests across the project (ctx = YamlRefactorContext).
    Reads test declarations from each model's sidecar YAML doc.
    ``skip_models`` drops models whose build failed — dbt build never
    tests a relation that was not (re)built this invocation."""
    from dbt_osmosis_spark.compile import relation_name
    from dbt_osmosis_spark.yaml_engine import model_entry

    results: list[DataTestResult] = []
    for name in ctx.manifest.topo_sort():
        if skip_models and name in skip_models:
            continue
        path = ctx.doc_path(name)
        if not path.exists():
            continue
        entry = model_entry(ctx.yaml.read(path), name)
        if entry:
            results.extend(
                run_model_tests(
                    spark, name, entry, relation_name(name),
                    store_failures_dir=store_failures_dir,
                )
            )
    return results
