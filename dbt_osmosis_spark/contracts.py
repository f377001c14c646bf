"""Model contracts — dbt's `contract: {enforced: true}` build gate on Spark.

The reference validates contract-style YAML structure (SURVEY M37,
src/dbt_osmosis/core/schema/validation.py:226-996) and synchronizes
data_type strings between warehouse and YAML (M14,
src/dbt_osmosis/core/transforms.py:583-644), but leaves enforcement to
dbt-core + the warehouse. Here the runner enforces at materialization
time: the compiled DataFrame's Catalyst-analyzed schema must match the
declared columns exactly (names + types, warehouse-agnostic spellings
normalized) BEFORE anything is written or registered — dbt's pre-flight
contract check, at zero data cost (schema only, no job runs).

Optional data-plane checks (`contract_data_checks=true` model config)
verify `not_null` constraints in ONE combined aggregate over the build
output — a map-side partial aggregation of null indicators, so the cost
is a single extra scan regardless of how many columns are constrained
(never one job per constraint).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ContractError(ValueError):
    """The build output violates the model's enforced contract."""


# Warehouse-agnostic type spellings → Spark simpleString base names.
_TYPE_ALIASES = {
    "text": "string",
    "varchar": "string",
    "char": "string",
    "character varying": "string",
    "string": "string",
    "integer": "int",
    "int4": "int",
    "long": "bigint",
    "int8": "bigint",
    "short": "smallint",
    "int2": "smallint",
    "byte": "tinyint",
    "real": "float",
    "double precision": "double",
    "bool": "boolean",
    "numeric": "decimal",
    "datetime": "timestamp",
}

_TYPE_RE = re.compile(r"^([a-z_][a-z_ ]*?)\s*(?:\(([^)]*)\))?$")


def normalize_type(type_str: str) -> str:
    """Canonicalize a declared data_type to Spark's simpleString form.

    `varchar(256)`/`text` → `string` (length is a metadata annotation, not
    a Spark runtime type — SURVEY §1.2); `numeric(18,3)` → `decimal(18,3)`;
    bare `decimal` gets Spark's (10,0) default. Unknown names pass through
    so struct/array/map strings still compare exactly.
    """
    t = type_str.strip().lower()
    m = _TYPE_RE.match(t)
    if not m:
        return t
    base, args = m.group(1).strip(), m.group(2)
    base = _TYPE_ALIASES.get(base, base)
    if base == "string":
        return "string"
    if base == "decimal":
        return f"decimal({args.replace(' ', '')})" if args else "decimal(10,0)"
    return base


def contract_violations(columns: list[dict], df: DataFrame) -> list[str]:
    """Compare declared contract columns against the frame's schema.

    Returns human-readable violations: undeclared output columns, declared
    columns missing from the output, type mismatches, and declared columns
    lacking a data_type (dbt requires every column typed under an enforced
    contract). Empty list = contract satisfied.
    """
    problems: list[str] = []
    declared: dict[str, str] = {}
    for c in columns:
        name = c.get("name", "")
        if not c.get("data_type"):
            problems.append(f"column '{name}' has no data_type (required by enforced contract)")
        else:
            declared[name] = c["data_type"]
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for name, want in declared.items():
        if name not in actual:
            problems.append(f"declared column '{name}' ({want}) missing from model output")
        elif normalize_type(want) != normalize_type(actual[name]):
            problems.append(
                f"column '{name}': declared {want} ({normalize_type(want)}) "
                f"but model produced {actual[name]}"
            )
    for name in actual:
        if name not in declared and not any(c.get("name") == name for c in columns):
            problems.append(f"model output column '{name}' is not declared in the contract")
    return problems


def not_null_columns(columns: list[dict]) -> list[str]:
    """Column names carrying a not_null constraint in the contract."""
    out = []
    for c in columns:
        for cons in c.get("constraints") or []:
            kind = cons.get("type") if isinstance(cons, dict) else cons
            if kind == "not_null":
                out.append(c["name"])
    return out


def not_null_violations(df: DataFrame, cols: list[str]) -> dict[str, int]:
    """Null counts per constrained column, in one combined aggregate pass."""
    if not cols:
        return {}
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    return {c: int(row[c]) for c in cols if row[c]}


def enforce_contract(node, df: DataFrame) -> None:
    """Raise ContractError if `df` violates the node's enforced contract.

    Schema enforcement is always on (free — Catalyst analysis only). Data
    checks (not_null) run only with `contract_data_checks=true` config:
    one extra aggregate scan of the build output.
    """
    problems = contract_violations(node.columns, df)
    if problems:
        raise ContractError(
            f"model '{node.name}' violates its enforced contract:\n  - "
            + "\n  - ".join(problems)
        )
    if node.config.get("contract_data_checks"):
        bad = not_null_violations(df, not_null_columns(node.columns))
        if bad:
            detail = ", ".join(f"{c}: {n} null(s)" for c, n in sorted(bad.items()))
            raise ContractError(
                f"model '{node.name}' violates not_null constraints: {detail}"
            )
