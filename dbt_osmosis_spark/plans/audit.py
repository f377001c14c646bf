"""Physical-plan audit helpers.

The scale claims in this engine (broadcast the dim side, push filters to the
parquet scan, top-k instead of global sort, no accidental cartesian
products) are *testable plan properties*, not prose — these helpers read the
executed/optimized physical plan string so tests can assert them
(tests/test_plans.py). On a real cluster the same checks run against
`df.explain("formatted")` output unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final physical plan (AQE-resolved where possible) as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    """True when a real cartesian product appears (broadcast nested-loop of
    a 1-row side — e.g. a scalar query vector — is NOT a cartesian risk)."""
    return "CartesianProduct" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node in the plan."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan) if m.group(1)]


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — evidence of column pruning."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def uses_top_k(df: DataFrame) -> bool:
    """orderBy+limit planned as TakeOrderedAndProject (per-partition top-k +
    small merge), not a full global sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:range|hash|Single)", plan))


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the plan compiles — wider spans =
    more of the query fused into generated JVM loops."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters lists from every scan node — evidence that a filter
    on a hive-style partition column prunes directories instead of reading
    and discarding rows (the difference between scanning one day and
    scanning 100 TB)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan) if m.group(1)]
