"""Local DuckDB-oracle parity harness.

Mirrors the driver's t2 gate: run the Spark query and the DuckDB oracle SQL
on the same parquet tables, compare row count, column names, and
order-insensitive stringified values. Used by tests and by `python -m
dbt_osmosis_spark.oracle` while iterating.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


# ---- dtype discipline --------------------------------------------------
# The driver canonicalizes values dtype-sensitively (the round-2 q37
# lesson: an int64/int32 drift hash-mismatches even when stringified
# values agree), while _norm_cell below compares stringifications. These
# maps project Spark simpleString and DuckDB DESCRIBE types onto one
# canonical vocabulary so a dtype drift fails HERE, naming the column,
# before the driver sees it.

_SPARK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "integer": "i32",
    "bigint": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
}

_DUCK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "integer": "i32",
    "bigint": "i64",
    "hugeint": "i128",
    "float": "f32",
    "real": "f32",
    "double": "f64",
    "varchar": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp with time zone": "ts",
    "timestamp_ns": "ts",
    "blob": "bin",
}


def _canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal("):
        return "dec" + t[len("decimal"):]
    if t.startswith("array<") and t.endswith(">"):
        return f"arr<{_canon_spark_type(t[6:-1])}>"
    return _SPARK_CANON.get(t, t)


def _canon_duck_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal("):
        return "dec" + t[len("decimal"):].replace(" ", "")
    if t.endswith("[]"):
        return f"arr<{_canon_duck_type(t[:-2])}>"
    return _DUCK_CANON.get(t, t)


def _dtype_issues(spark_schema, con, oracle_sql: str) -> list[str]:
    """Per-column canonical dtype comparison via DuckDB DESCRIBE (no data
    scan). Returns issue strings naming each drifted column."""
    duck_types = {
        row[0]: str(row[1])
        for row in con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    }
    issues = []
    for f in spark_schema.fields:
        if f.name not in duck_types:
            continue  # column-name mismatch is reported separately
        s, d = _canon_spark_type(f.dataType.simpleString()), _canon_duck_type(
            duck_types[f.name]
        )
        if s != d:
            issues.append(
                f"dtype drift on '{f.name}': spark={f.dataType.simpleString()}"
                f" ({s}) oracle={duck_types[f.name]} ({d})"
            )
    return issues


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; bit-identical values match.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows, colnames) -> list[tuple[str, ...]]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    issues: list[str] = field(default_factory=list)


def check_parity(spark: SparkSession, name: str, sf_dir: str, con=None) -> ParityResult:
    from dbt_osmosis_spark.operators import ORACLES, QUERIES, load_all

    load_all()
    res = ParityResult(name=name, ok=True)
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = [f.name for f in sdf.schema.fields]
    res.spark_rows = len(spark_rows)

    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        if res.spark_rows == 0:
            res.ok = False
            res.issues.append("rows-only check: 0 rows")
        return res

    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        dtype_issues = _dtype_issues(sdf.schema, con, ORACLES[name])
        cur = con.execute(ORACLES[name])
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        if own_con:
            con.close()
    if dtype_issues:
        res.ok = False
        res.issues.extend(dtype_issues)
    res.oracle_rows = len(oracle_rows)

    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.issues.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.issues.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    s_norm = _normalize([tuple(r) for r in spark_rows], spark_cols)
    o_norm = _normalize(oracle_rows, oracle_cols)
    if s_norm != o_norm:
        res.ok = False
        diffs = [i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b][:3]
        for i in diffs:
            res.issues.append(f"row {i}: spark={s_norm[i]} oracle={o_norm[i]}")
        if not diffs:
            res.issues.append("value mismatch in extra/missing rows")
    return res


def main() -> None:
    import sys

    from dbt_osmosis_spark.operators import QUERIES, load_all
    from dbt_osmosis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    load_all()
    names = sys.argv[1:] or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(QUERIES)}")
        sys.exit(2)
    spark = get_spark(cpus=8)
    con = duckdb_connect(sf_dir)
    failed = 0
    for name in names:
        r = check_parity(spark, name, sf_dir, con)
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {name}: spark={r.spark_rows} oracle={r.oracle_rows}")
        for issue in r.issues:
            print(f"     {issue}")
        failed += 0 if r.ok else 1
    print(f"{len(names) - failed}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
