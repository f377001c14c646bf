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


class _QueryResult:
    """Minimal agate-Table stand-in returned by `run_query` in macros:
    `.columns` (names) and iterable `.rows` (pyspark Rows — attribute and
    index access both work, like agate rows)."""

    def __init__(self, columns: list[str], rows: list):
        self.columns = columns
        self.rows = rows

    def __iter__(self):
        return iter(self.rows)

    def __len__(self) -> int:
        return len(self.rows)


class _DbtUtils:
    """Built-in macro namespace covering the dbt_utils calls compiled
    models lean on most. Everything renders to Spark SQL TEXT (these are
    codegen helpers, not runtime operators); the introspective ones
    (`star`, `get_column_values`) need the compiler's live SparkSession.
    """

    def __init__(self, compiler: "JinjaCompiler"):
        self._c = compiler

    def _spark(self):
        if self._c.spark is None:
            raise RuntimeError(
                "this macro introspects relations and needs a live engine "
                "(JinjaCompiler(manifest, spark=...))"
            )
        return self._c.spark

    def star(self, relation: str, **kw) -> str:
        """Column list of `relation` minus `except` — dbt_utils.star."""
        exc = {c.lower() for c in (kw.get("except") or kw.get("except_") or [])}
        cols = [f.name for f in self._spark().table(relation).schema.fields]
        return ", ".join(c for c in cols if c.lower() not in exc)

    def surrogate_key(self, cols: list[str]) -> str:
        """Deterministic md5 key over the columns (null-safe, dbt_utils
        generate_surrogate_key semantics: nulls encode as a sentinel)."""
        parts = ", ".join(f"coalesce(cast({c} as string), '_null_')" for c in cols)
        return f"md5(concat_ws('-', {parts}))"

    # Hard cap on compile-time value collection: the result becomes inline
    # SQL text (pivot branches), so an unbounded distinct on a high-cardinality
    # column would both OOM the driver and generate a megabyte query. Mirrors
    # dbt_utils.get_column_values' max_records contract.
    MAX_COLUMN_VALUES = 10_000

    def get_column_values(
        self, relation: str, column: str, limit: int | None = None, max_records: int | None = None
    ) -> list:
        """Distinct values of a column at compile time (drives codegen
        loops like dynamic pivots) — one small distinct query, always
        bounded (dbt_utils' max_records; default cap 10k)."""
        cap = limit or max_records or self.MAX_COLUMN_VALUES
        df = (
            self._spark()
            .table(relation)
            .select(column)
            .distinct()
            .orderBy(column)
            .limit(cap)
        )
        return [r[0] for r in df.collect()]

    def date_spine(self, datepart: str, start_date: str, end_date: str) -> str:
        """Inline date spine subquery (sequence+explode — in-plan, no
        driver loop; same shape as operator q32)."""
        return (
            f"(select explode(sequence(cast('{start_date}' as date), "
            f"cast('{end_date}' as date), interval 1 {datepart})) "
            f"as date_{datepart})"
        )

    def pivot(self, column: str, values: list, agg: str = "sum", then_value: str = "1") -> str:
        """Manual pivot expression list — dbt_utils.pivot."""
        exprs = []
        for v in values:
            safe = re.sub(r"[^A-Za-z0-9_]", "_", str(v))
            exprs.append(
                f"{agg}(case when {column} = '{v}' then {then_value} else 0 end) as {column}_{safe}"
            )
        return ", ".join(exprs)


class JinjaCompiler:
    """Compile Jinja-SQL against a manifest.

    ref('x') / ref('x', v=N)  → relation name of model/seed x
    source('s','t')           → relation name of source s.t
    var('k', default)         → project vars
    config(...)               → swallowed at compile time (parsed separately)
    run_query(sql)            → compile-time query (needs spark); rows+columns
    execute                   → dbt's parse-vs-execute flag (spark is bound?)
    dbt_utils.*               → built-in macro namespace (star, surrogate_key,
                                get_column_values, date_spine, pivot)
    """

    def __init__(self, manifest: Manifest, spark=None):
        self.manifest = manifest
        self.spark = spark
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
            v = v if v is not None else _kw.get("version")
            if v is not None and f"{name}_v{v}" in self.manifest.models:
                target = f"{name}_v{v}"
            elif v is None and name in self.manifest.version_aliases:
                # dbt versioned-model contract: a bare ref resolves to
                # latest_version
                target = self.manifest.version_aliases[name]
            else:
                target = name
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

        def run_query(q: str) -> _QueryResult:
            # dbt's compile-time query hook (macro introspection, dynamic
            # codegen). The inner SQL goes through the same compile so
            # ref()/source() resolve; the result is collected to the driver
            # — macros should query SMALL things (distinct values, maxes)
            if self.spark is None:
                raise RuntimeError(
                    "run_query needs a live engine: JinjaCompiler(manifest, spark=...)"
                )
            inner = self.compile(q, extra_vars).compiled_sql
            df = self.spark.sql(inner)
            return _QueryResult(list(df.columns), df.collect())

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
            run_query=run_query,
            # dbt's parse-vs-execute flag: macros guard introspection with
            # {% if execute %} — true exactly when an engine is bound
            execute=self.spark is not None,
            dbt_utils=_DbtUtils(self),
            # dbt target context: the engine IS the target (profiles.yml's
            # role collapses to the SparkSession), but target.name carries
            # the profile's selected output (or --target override) so
            # `{% if target.name == 'prod' %}` project logic still branches
            target={
                "name": self.manifest.target or "spark",
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
