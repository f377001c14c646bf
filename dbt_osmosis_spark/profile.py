"""One-pass distributed relation profiling (SURVEY M35 — the workbench's
result-profile panel, reference: src/dbt_osmosis/workbench/app.py:423-489,
there via ydata-profiling on a collected pandas frame).

Here the profile is computed *on the cluster* in a single aggregation pass:
every column contributes count/nulls/approx-distinct, numerics add
min/max/mean/stddev, strings add length stats — one job, no row collection,
so it profiles a 100 TB table as readily as a preview (approx_count_distinct
keeps distinct-counting at constant memory).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


@dataclass
class ColumnProfile:
    name: str
    data_type: str
    n: int
    nulls: int
    approx_distinct: int
    min: object = None
    max: object = None
    mean: float | None = None
    stddev: float | None = None
    avg_length: float | None = None


@dataclass
class RelationProfile:
    relation: str
    n_rows: int
    columns: list[ColumnProfile] = field(default_factory=list)


def profile(df: DataFrame, relation: str = "<df>") -> RelationProfile:
    """All column stats in ONE aggregate job."""
    exprs: list = [F.count(F.lit(1)).alias("__n")]
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for name, dtype in fields:
        base = dtype.split("(")[0]
        c = F.col(name)
        exprs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls"))
        exprs.append(F.approx_count_distinct(name).alias(f"{name}__dist"))
        if base in _NUMERIC:
            exprs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
                F.avg(c).alias(f"{name}__mean"),
                F.stddev(c).alias(f"{name}__std"),
            ]
        elif base in ("string", "varchar", "char"):
            exprs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
                F.avg(F.length(c)).alias(f"{name}__avglen"),
            ]
        elif base in ("date", "timestamp"):
            exprs += [F.min(c).alias(f"{name}__min"), F.max(c).alias(f"{name}__max")]
    row = df.agg(*exprs).collect()[0].asDict()

    out = RelationProfile(relation=relation, n_rows=row["__n"])
    for name, dtype in fields:
        out.columns.append(
            ColumnProfile(
                name=name,
                data_type=dtype,
                n=row["__n"],
                nulls=row[f"{name}__nulls"],
                approx_distinct=row[f"{name}__dist"],
                min=row.get(f"{name}__min"),
                max=row.get(f"{name}__max"),
                mean=row.get(f"{name}__mean"),
                stddev=row.get(f"{name}__std"),
                avg_length=row.get(f"{name}__avglen"),
            )
        )
    return out
