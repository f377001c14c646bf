"""Schema introspection + catalog artifact (SURVEY M16/M17, S18).

The reference introspects live relations via the adapter with a
per-connection cache and prefers a cached catalog.json artifact
(reference: src/dbt_osmosis/core/introspection.py:1370-1514, :1517-1576).
Spark's catalog is in-process, so "live" introspection is a metadata call —
but the artifact shape is preserved so downstream tooling (YAML sync, diff,
doc coverage) works unchanged.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession


@dataclass
class ColumnInfo:
    """Reference ColumnInfo analog (name/type/comment/index)
    (reference shape: src/dbt_osmosis/core/introspection.py:1517-1576)."""

    name: str
    data_type: str
    index: int
    comment: str = ""
    meta: dict = field(default_factory=dict)


_COLUMN_CACHE: dict[tuple[int, str], list[ColumnInfo]] = {}


def get_columns(spark: SparkSession, relation: str, use_cache: bool = True) -> list[ColumnInfo]:
    """Ordered columns of a registered relation. Cached per (session,
    relation) like the reference's warehouse column cache
    (reference: src/dbt_osmosis/core/introspection.py:99-140)."""
    key = (id(spark), relation)
    if use_cache and key in _COLUMN_CACHE:
        return _COLUMN_CACHE[key]
    schema = spark.table(relation).schema
    cols = [
        ColumnInfo(
            name=f.name,
            data_type=f.dataType.simpleString(),
            index=i,
            comment=str(f.metadata.get("comment", "")) if f.metadata else "",
        )
        for i, f in enumerate(schema.fields)
    ]
    _COLUMN_CACHE[key] = cols
    return cols


def clear_column_cache() -> None:
    _COLUMN_CACHE.clear()


def generate_catalog(spark: SparkSession, relations: list[str] | None = None) -> dict:
    """catalog.json-shaped artifact: relation → ordered column dicts.

    One sweep over temp views + catalog tables (the reference's
    `create_catalog_if_not_exists` analog)."""
    if relations is None:
        relations = sorted(
            t.name for t in spark.catalog.listTables() if t.tableType in ("TEMPORARY", "VIEW", "MANAGED", "EXTERNAL")
        )
    nodes = {}
    for rel in relations:
        nodes[rel] = {"columns": [asdict(c) for c in get_columns(spark, rel, use_cache=False)]}
    return {"nodes": nodes}


def write_catalog(spark: SparkSession, path: str | Path, relations: list[str] | None = None) -> dict:
    catalog = generate_catalog(spark, relations)
    Path(path).write_text(json.dumps(catalog, indent=2))
    return catalog


def load_catalog(path: str | Path) -> dict | None:
    p = Path(path)
    if not p.exists():
        return None
    return json.loads(p.read_text())
