"""Heuristic SQL linter (SURVEY M30).

The reference lints with sqlglot-parsed rule objects (reference:
src/dbt_osmosis/core/sql_lint.py:131-474). sqlglot is not in this
container, so the same rule surface is implemented with regex/heuristics:

- keyword-case (keywords should be a consistent case; default upper)
- line-length (max 100 — reference default)
- select-star (reference: sql_lint.py:343-379)
- short-alias (< 3 chars — reference rule)
- unneeded-quotes around simple identifiers

Each rule returns (rule, line, message) findings; `lint_model` compiles a
model first (the reference's dbt-compile-then-lint flow).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from dbt_osmosis_spark.compile import JinjaCompiler
from dbt_osmosis_spark.project import Manifest

MAX_LINE_LENGTH = 100  # reference default

_KEYWORDS = (
    "select|from|where|group by|order by|having|join|left join|right join|"
    "inner join|full join|cross join|union|intersect|except|limit|with|on|as|"
    "case|when|then|else|end|and|or|not|in|exists|distinct"
)


@dataclass
class LintFinding:
    rule: str
    line: int
    message: str


def lint_sql(sql: str, keyword_case: str = "lower") -> list[LintFinding]:
    findings: list[LintFinding] = []
    lines = sql.splitlines()
    in_block_comment = False
    for i, line in enumerate(lines, start=1):
        stripped = line.strip()
        if in_block_comment:
            if "*/" in stripped:
                in_block_comment = False
            continue
        if stripped.startswith("/*") and "*/" not in stripped:
            in_block_comment = True
            continue
        if stripped.startswith("--"):
            continue
        code = re.split(r"--", line, maxsplit=1)[0]

        if len(line.rstrip()) > MAX_LINE_LENGTH:
            findings.append(
                LintFinding("line-length", i, f"line exceeds {MAX_LINE_LENGTH} chars")
            )
        for m in re.finditer(rf"\b({_KEYWORDS})\b", code, flags=re.IGNORECASE):
            word = m.group(0)
            want = word.lower() if keyword_case == "lower" else word.upper()
            if word != want:
                findings.append(
                    LintFinding(
                        "keyword-case", i, f"keyword '{word}' should be '{want}'"
                    )
                )
                break  # one per line, like a reasonable linter
        if re.search(r"\bselect\s+\*", code, flags=re.IGNORECASE) and not re.search(
            r"\bcount\s*\(\s*\*\s*\)", code, flags=re.IGNORECASE
        ):
            findings.append(LintFinding("select-star", i, "select * prevents column pruning documentation"))
        for m in re.finditer(r"\b(from|join)\s+\S+\s+(?:as\s+)?([a-z_][a-z0-9_]*)\b", code, flags=re.IGNORECASE):
            alias = m.group(2)
            if alias.lower() in ("on", "as", "where", "left", "right", "inner", "cross", "full", "group", "order", "using", "lateral"):
                continue
            if len(alias) < 3:
                findings.append(
                    LintFinding("short-alias", i, f"alias '{alias}' shorter than 3 chars")
                )
        for m in re.finditer(r'"([a-z_][a-z0-9_]*)"', code):
            findings.append(
                LintFinding("unneeded-quotes", i, f"identifier \"{m.group(1)}\" does not need quotes")
            )
    return findings


def lint_model(manifest: Manifest, model: str, keyword_case: str = "lower") -> list[LintFinding]:
    compiled = JinjaCompiler(manifest).compile(manifest.models[model].raw_sql)
    return lint_sql(compiled.compiled_sql, keyword_case=keyword_case)


def lint_project(manifest: Manifest, keyword_case: str = "lower") -> dict[str, list[LintFinding]]:
    """(reference project iteration: sql_lint.py:671-695; python models are
    not SQL — the linter skips them)"""
    return {
        name: lint_model(manifest, name, keyword_case=keyword_case)
        for name in manifest.topo_sort()
        if manifest.models[name].language != "python"
    }
