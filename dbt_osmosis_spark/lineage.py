"""Column-level lineage derived from Catalyst column pruning.

The reference builds its column "knowledge graph" by NAME-matching columns
across the DAG (case/prefix variants, reference:
src/dbt_osmosis/core/inheritance.py:433-495) — it never parses SQL, so a
renamed or computed column breaks the chain. Here lineage is computed from
the engine itself: select ONE output column of a model and let Catalyst
prune the plan — the per-scan `ReadSchema` that survives is exactly the
set of source columns whose values can affect that output column (through
arbitrarily deep view chains, expressions, joins, and filters). No SQL
parser, no name heuristics, and it is correct by construction because it
is the same pruning the execution engine itself trusts.

Semantics: this is *provenance* lineage — join keys and filter columns
count as dependencies (they decide which rows exist), not only columns
that flow into the output value. Cost: one driver-side plan analysis per
output column; no Spark job runs (explain only), so lineage over a 100 TB
warehouse is free.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from dbt_osmosis_spark.compile import JinjaCompiler, relation_name
from dbt_osmosis_spark.plans.audit import formatted_plan
from dbt_osmosis_spark.project import Manifest

# one scan block in a formatted plan:
#   (1) Scan parquet
#   ...
#   Location: InMemoryFileIndex [file:/path/to/tbl.parquet]
#   ReadSchema: struct<a:bigint,b:string>
_SCAN_RE = re.compile(
    r"Scan (?:parquet|csv|json)[^\n]*\n(?:.*\n)*?"
    r".*Location: \w+(?: \w+)* \[([^\]]*)\]\n"
    r"(?:.*\n)*?.*ReadSchema: (\S+)",
    re.MULTILINE,
)
_FIELD_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*):")


def _scan_columns(df: DataFrame) -> dict[str, set[str]]:
    """{scan location path: columns read} for every file scan in the plan."""
    out: dict[str, set[str]] = {}
    plan = formatted_plan(df)
    # formatted explain prints one node section per scan; split on blank
    # lines so the non-greedy regex cannot bridge two scan nodes
    for section in plan.split("\n\n"):
        m = _SCAN_RE.search(section)
        if not m:
            continue
        loc = m.group(1).split(",")[0].strip()
        cols = set(_FIELD_RE.findall(m.group(2)))
        out.setdefault(loc, set()).update(cols)
    return out


def _path_index(manifest: Manifest, warehouse_dir: str | None) -> dict[str, str]:
    """Normalize node storage paths → node names, for scan attribution."""
    idx: dict[str, str] = {}
    for key, src in manifest.sources.items():
        if src.path is not None:
            idx[os.path.abspath(src.path)] = key
    for name, seed in manifest.seeds.items():
        idx[os.path.abspath(seed.path)] = name
    if warehouse_dir:
        for name in manifest.models:
            idx[os.path.abspath(os.path.join(warehouse_dir, f"{name}.parquet"))] = name
    return idx


def _attribute(scans: dict[str, set[str]], idx: dict[str, str]) -> dict[str, list[str]]:
    named: dict[str, set[str]] = {}
    for loc, cols in scans.items():
        path = os.path.abspath(loc.removeprefix("file:"))
        name = idx.get(path, path)
        named.setdefault(name, set()).update(cols)
    return {k: sorted(v) for k, v in sorted(named.items())}


def register_views(spark: SparkSession, manifest: Manifest) -> None:
    """Register every node as a lazy temp view (no data written, no jobs):
    enough plan surface for lineage/explain over the whole DAG without a
    `run`. Table/incremental materialization configs are ignored on
    purpose — views inline, so scans bottom out at the original sources
    and lineage crosses model boundaries."""
    from dbt_osmosis_spark.runner import _run_python_model
    from dbt_osmosis_spark.sources.registry import read_source
    from dbt_osmosis_spark.sources.seeds import load_seed

    compiler = JinjaCompiler(manifest, spark=spark)
    for key, src in manifest.sources.items():
        if src.path is None:
            continue  # declared-only: no storage to register
        read_source(spark, src.path, src.format).createOrReplaceTempView(relation_name(key))
    for name, seed in manifest.seeds.items():
        load_seed(spark, seed.path, name=relation_name(name), column_types=seed.column_types)
    for name in manifest.topo_sort():
        node = manifest.models[name]
        if node.materialized == "ephemeral":
            continue  # consumers inline ephemeral bodies at compile time
        if node.language == "python":
            df = _run_python_model(spark, node)
        else:
            df = spark.sql(compiler.compile(node.raw_sql).compiled_sql)
        df.createOrReplaceTempView(relation_name(name))


def column_lineage(
    spark: SparkSession,
    manifest: Manifest,
    model: str,
    column: str,
    warehouse_dir: str | None = None,
) -> dict[str, list[str]]:
    """Source columns that can affect `model.column`: {node_name: [cols]}."""
    df = spark.table(relation_name(model)).select(column)
    return _attribute(_scan_columns(df), _path_index(manifest, warehouse_dir))


def model_lineage(
    spark: SparkSession,
    manifest: Manifest,
    model: str,
    warehouse_dir: str | None = None,
) -> dict[str, dict[str, list[str]]]:
    """Lineage for every output column of `model`."""
    rel = relation_name(model)
    idx = _path_index(manifest, warehouse_dir)
    out: dict[str, dict[str, list[str]]] = {}
    for c in spark.table(rel).columns:
        out[c] = _attribute(_scan_columns(spark.table(rel).select(c)), idx)
    return out
