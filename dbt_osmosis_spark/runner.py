"""Model runner: topo-ordered materialization (the `dbt run` analog).

The reference delegates materialization to dbt-core + warehouse; our runner
walks the manifest parents-first (Kahn order, SURVEY M4) and registers every
node as a Spark relation:

- seed   → CSV read → temp view (+ optional parquet persist)
- source → parquet/csv/json read → temp view
- model  → Jinja-compile (M1) → spark.sql → temp view (`view`),
           or parquet write + re-read (`table`) for materialized models.

`view` materialization keeps the whole DAG lazy: Catalyst inlines the chain
and optimizes across model boundaries (filter pushdown through a stack of
models — something the reference's per-model warehouse round-trips cannot
do). `table` cuts the lineage for reuse-heavy nodes — the 100 TB analog of
dbt's table materialization, and where bucketing/partitioning is applied.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.compile import JinjaCompiler, relation_name
from dbt_osmosis_spark.project import Manifest
from dbt_osmosis_spark.sources.parquet import read_parquet
from dbt_osmosis_spark.sources.seeds import load_seed


@dataclass
class RunResult:
    name: str
    kind: str  # seed | source | model
    materialized: str
    rows: int | None = None  # only counted when count_rows=True
    compiled_sql: str | None = None


@dataclass
class RunReport:
    results: list[RunResult] = field(default_factory=list)

    def names(self) -> list[str]:
        return [r.name for r in self.results]


def materialize(
    spark: SparkSession,
    manifest: Manifest,
    warehouse_dir: str | None = None,
    count_rows: bool = False,
    partition_overrides: dict[str, list[str]] | None = None,
) -> RunReport:
    """Register all nodes as Spark relations, parents first.

    ``warehouse_dir`` is where `table`-materialized models persist as
    parquet; ``partition_overrides`` maps model name → partitionBy columns
    (scale lever: physical layout of hot tables).
    """
    report = RunReport()
    compiler = JinjaCompiler(manifest)

    for key, src in manifest.sources.items():
        rel = relation_name(key)
        if src.format == "parquet":
            df = read_parquet(spark, src.path)
        elif src.format == "csv":
            df = spark.read.option("header", True).option("inferSchema", True).csv(src.path)
        elif src.format == "json":
            df = spark.read.json(src.path)
        else:
            raise ValueError(f"unsupported source format: {src.format}")
        df.createOrReplaceTempView(rel)
        report.results.append(RunResult(key, "source", "view"))

    for name, seed in manifest.seeds.items():
        df = load_seed(spark, seed.path, name=relation_name(name))
        report.results.append(
            RunResult(name, "seed", "view", rows=df.count() if count_rows else None)
        )

    for name in manifest.topo_sort():
        node = manifest.models[name]
        compiled = compiler.compile(node.raw_sql)
        df: DataFrame = spark.sql(compiled.compiled_sql)
        rel = relation_name(name)
        if node.materialized == "table":
            bucket_by = node.config.get("bucket_by")
            buckets = int(node.config.get("buckets") or 0)
            if bucket_by and buckets:
                # Bucketed catalog table: co-locates joins/aggs on the bucket
                # key — two tables bucketed the same way join with ZERO
                # shuffle (asserted in tests/test_plans.py). At 100 TB this
                # is the difference between re-shuffling every fact join and
                # none; bucket count is the config knob.
                cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
                spark.sql(f"DROP TABLE IF EXISTS {rel}")
                (
                    df.write.mode("overwrite")
                    .format("parquet")
                    .bucketBy(buckets, *cols)
                    .sortBy(*cols)
                    .saveAsTable(rel)
                )
                report.results.append(
                    RunResult(
                        name,
                        "model",
                        "table(bucketed)",
                        rows=spark.table(rel).count() if count_rows else None,
                        compiled_sql=compiled.compiled_sql,
                    )
                )
                continue
            if warehouse_dir is None:
                raise ValueError(f"model {name} is materialized=table but no warehouse_dir")
            out = os.path.join(warehouse_dir, f"{name}.parquet")
            writer = df.write.mode("overwrite")
            parts = (partition_overrides or {}).get(name) or node.config.get("partition_by")
            if parts:
                if isinstance(parts, str):
                    parts = [parts]
                writer = writer.partitionBy(*parts)
            writer.parquet(out)
            df = spark.read.parquet(out)
        df.createOrReplaceTempView(rel)
        report.results.append(
            RunResult(
                name,
                "model",
                node.materialized,
                rows=df.count() if count_rows else None,
                compiled_sql=compiled.compiled_sql,
            )
        )
    return report
