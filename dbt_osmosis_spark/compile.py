"""Jinja-SQL → Spark SQL compilation (SURVEY M1, S17).

The reference compiles Jinja SQL through dbt's compiler: temp node injection,
``process_node`` ref/source resolution, ``SqlCompileRunner.compile``
(reference: src/dbt_osmosis/core/sql_operations.py:27-57). Here the same
contract — `{{ ref() }}`, `{{ source() }}`, `{{ config() }}`, `{{ var() }}`,
loops, `{% set %}` — is provided by a plain Jinja2 environment whose
resolvers return *Spark relation names* (temp views / tables registered by
the runner). Compilation is a pure text stage; execution is `spark.sql`.
"""

from __future__ import annotations

import datetime
import os
import re
from dataclasses import dataclass, field

import jinja2

from dbt_osmosis_spark.project import Manifest

_JINJA_TOKENS = ("{{", "{%", "{#")


def has_jinja(sql: str) -> bool:
    """Token scan (reference: src/dbt_osmosis/core/sql_operations.py:21-24)."""
    return any(tok in sql for tok in _JINJA_TOKENS)


@dataclass
class CompiledSQL:
    raw_sql: str
    compiled_sql: str
    refs: list[str] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)


def _relation_for(name: str) -> str:
    """Spark relation name for a model/seed/source node. Dots are not legal
    in view names — source keys `schema.table` map to `schema__table`."""
    return name.replace(".", "__")


class JinjaCompiler:
    """Compile Jinja-SQL against a manifest.

    ref('x') / ref('x', v=N)  → relation name of model/seed x
    source('s','t')           → relation name of source s.t
    var('k', default)         → project vars
    config(...)               → swallowed at compile time (parsed separately)
    """

    def __init__(self, manifest: Manifest):
        self.manifest = manifest
        self.env = jinja2.Environment(undefined=jinja2.StrictUndefined)
        # pinned once per compiler: every model in a run sees the SAME
        # run_started_at (dbt contract — enables consistent partition stamps)
        self.run_started_at = datetime.datetime.now(datetime.timezone.utc)

    def compile(
        self,
        sql: str,
        extra_vars: dict | None = None,
        this: str | None = None,
        incremental: bool = False,
        _ephemeral: dict | None = None,
    ) -> CompiledSQL:
        """``this`` is the model's own relation name and ``incremental``
        whether an existing materialization is being built upon — together
        they power the `{{ this }}` / `is_incremental()` contract dbt
        incremental models rely on.

        Ephemeral models (dbt's third materialization) never become
        relations: a ref() to one compiles its body recursively and
        injects it as a `__dbt__cte__<name>` CTE (dbt's exact convention),
        dependency-ordered so nested ephemerals precede their consumers.
        ``_ephemeral`` is the shared collection dict during recursion."""
        refs: list[str] = []
        sources: list[tuple[str, str]] = []
        eph: dict[str, str | None] = {} if _ephemeral is None else _ephemeral

        def ref(name: str, v: int | None = None, **_kw) -> str:
            target = f"{name}_v{v}" if v and f"{name}_v{v}" in self.manifest.models else name
            known = self.manifest.node_names()
            if target not in known and name not in known:
                raise KeyError(f"ref('{name}') does not resolve to a known node")
            refs.append(target if target in known else name)
            resolved = refs[-1]
            node = self.manifest.models.get(resolved)
            if node is not None and node.materialized == "ephemeral":
                if resolved not in eph:
                    eph[resolved] = None  # reserve: cycle guard
                    inner = self.compile(
                        node.raw_sql, extra_vars, _ephemeral=eph
                    ).compiled_sql
                    # re-insert after the deps discovered while compiling
                    # the body, so the WITH list is dependency-ordered
                    del eph[resolved]
                    eph[resolved] = inner
                elif eph[resolved] is None:
                    raise ValueError(f"ephemeral model cycle through {resolved!r}")
                return f"__dbt__cte__{_relation_for(resolved)}"
            return _relation_for(resolved)

        def source(schema: str, table: str) -> str:
            key = f"{schema}.{table}"
            if key not in self.manifest.sources:
                raise KeyError(f"source('{schema}', '{table}') not declared")
            sources.append((schema, table))
            return _relation_for(key)

        def var(key: str, default=None):
            merged = {**self.manifest.vars, **(extra_vars or {})}
            return merged.get(key, default)

        def config(**_kw) -> str:
            return ""

        def is_incremental() -> bool:
            return incremental

        def env_var(key: str, default: str | None = None) -> str:
            # dbt contract: missing env var without default is a compile error
            val = os.environ.get(key, default)
            if val is None:
                raise KeyError(f"env_var('{key}') is not set and has no default")
            return val

        # dbt macro semantics: project macros/*.sql definitions are in scope
        # for every model (prepended — {% macro %} blocks render to nothing)
        if self.manifest.macro_source:
            sql = self.manifest.macro_source + "\n" + sql
        tpl = self.env.from_string(sql)
        compiled = tpl.render(
            ref=ref,
            source=source,
            var=var,
            config=config,
            this=this or "",
            is_incremental=is_incremental,
            env_var=env_var,
            # dbt target context: the engine IS the target (profiles.yml's
            # role collapses to the SparkSession)
            target={
                "name": "spark",
                "type": "spark",
                "schema": "default",
                "threads": 1,
            },
            run_started_at=self.run_started_at,
        )
        compiled = re.sub(r"\n{3,}", "\n\n", compiled).strip()
        if eph and _ephemeral is None:
            # top level only: prepend (or merge into) the WITH clause
            ctes = ",\n".join(
                f"__dbt__cte__{_relation_for(n)} as (\n{body}\n)" for n, body in eph.items()
            )
            if re.match(r"^\s*with\b", compiled, re.IGNORECASE):
                compiled = re.sub(
                    r"^\s*with\b", f"WITH {ctes},", compiled, count=1, flags=re.IGNORECASE
                )
            else:
                compiled = f"WITH {ctes}\n{compiled}"
        return CompiledSQL(raw_sql=sql, compiled_sql=compiled, refs=refs, sources=sources)


def relation_name(node_name: str) -> str:
    return _relation_for(node_name)
