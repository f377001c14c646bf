"""Tokenizer-backed SQL linter (SURVEY M30).

The reference lints with sqlglot-parsed rule objects (reference:
src/dbt_osmosis/core/sql_lint.py:131-474). sqlglot is not in this
container, so the same rule surface runs over a minimal hand-rolled SQL
tokenizer instead of raw regex — string literals, quoted identifiers and
comments are real token kinds, so rules can never false-positive inside a
literal (the failure mode of the regex approach).

Rules (same five as the reference's default set):

- keyword-case     keywords in a consistent case (default lower)
- line-length      max 100 chars (reference default)
- select-star      SELECT * (reference: sql_lint.py:343-379); count(*) and
                   qualified t.* are not flagged
- short-alias      table alias < 3 chars
- unneeded-quotes  "quoted" identifier that is a plain lowercase name

`lint_model` compiles a model first (the reference's
dbt-compile-then-lint flow).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from dbt_osmosis_spark.compile import JinjaCompiler
from dbt_osmosis_spark.project import Manifest

MAX_LINE_LENGTH = 100  # reference default

KEYWORDS = {
    "select", "from", "where", "group", "by", "order", "having", "join",
    "left", "right", "inner", "full", "cross", "outer", "union", "intersect",
    "except", "limit", "with", "on", "as", "case", "when", "then", "else",
    "end", "and", "or", "not", "in", "exists", "distinct", "using", "lateral",
    "between", "like", "is", "null", "all", "any", "over", "partition",
    "values", "insert", "update", "delete", "create", "table", "view",
}

# words that follow FROM/JOIN but are never table aliases
_NON_ALIAS = {
    "on", "as", "where", "left", "right", "inner", "cross", "full", "outer",
    "group", "order", "using", "lateral", "join", "union", "intersect",
    "except", "limit", "when", "then", "else", "end", "and", "or", "having",
}


@dataclass
class Token:
    kind: str  # word | string | qident | bident | number | punct
    text: str
    line: int


_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*")
_NUM_RE = re.compile(r"\d[\d.eE+\-]*")


def tokenize(sql: str) -> list[Token]:
    """Minimal SQL lexer: comments are dropped, strings / quoted identifiers
    / backquoted identifiers are single tokens (with '' and "" escapes),
    words and punctuation carry their line number."""
    out: list[Token] = []
    i, n, line = 0, len(sql), 1
    while i < n:
        ch = sql[i]
        if ch == "\n":
            line += 1
            i += 1
            continue
        if ch in " \t\r":
            i += 1
            continue
        if sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j
            continue
        if sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            seg = sql[i : (n if j < 0 else j + 2)]
            line += seg.count("\n")
            i = n if j < 0 else j + 2
            continue
        if ch in "'\"`":
            # quoted region with doubled-quote escape ('' / "")
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if ch != "`" and j + 1 < n and sql[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            text = sql[i : min(j + 1, n)]
            kind = {"'": "string", '"': "qident", "`": "bident"}[ch]
            out.append(Token(kind, text, line))
            line += text.count("\n")
            i = min(j + 1, n)
            continue
        m = _WORD_RE.match(sql, i)
        if m:
            out.append(Token("word", m.group(0), line))
            i = m.end()
            continue
        m = _NUM_RE.match(sql, i)
        if m:
            out.append(Token("number", m.group(0), line))
            i = m.end()
            continue
        out.append(Token("punct", ch, line))
        i += 1
    return out


@dataclass
class LintFinding:
    rule: str
    line: int
    message: str


def lint_sql(sql: str, keyword_case: str = "lower") -> list[LintFinding]:
    findings: list[LintFinding] = []

    for i, raw_line in enumerate(sql.splitlines(), start=1):
        if len(raw_line.rstrip()) > MAX_LINE_LENGTH:
            findings.append(
                LintFinding("line-length", i, f"line exceeds {MAX_LINE_LENGTH} chars")
            )

    toks = tokenize(sql)
    seen_kwcase_lines: set[int] = set()
    for idx, t in enumerate(toks):
        if t.kind == "word" and t.text.lower() in KEYWORDS:
            want = t.text.lower() if keyword_case == "lower" else t.text.upper()
            if t.text != want and t.line not in seen_kwcase_lines:
                # one per line, like a reasonable linter
                seen_kwcase_lines.add(t.line)
                findings.append(
                    LintFinding(
                        "keyword-case", t.line, f"keyword '{t.text}' should be '{want}'"
                    )
                )
        if t.kind == "word" and t.text.lower() == "select":
            nxt = toks[idx + 1] if idx + 1 < len(toks) else None
            if nxt is not None and nxt.kind == "punct" and nxt.text == "*":
                findings.append(
                    LintFinding(
                        "select-star",
                        t.line,
                        "select * prevents column pruning documentation",
                    )
                )
        if t.kind == "word" and t.text.lower() in ("from", "join"):
            # FROM/JOIN <relation> [AS] <alias>: relation may be dotted or a
            # subquery close-paren; flag a 1-2 char bare-word alias
            j = idx + 1
            if j < len(toks) and toks[j].kind == "punct" and toks[j].text == "(":
                # subquery relation: skip the balanced paren group
                depth = 1
                j += 1
                while j < len(toks) and depth:
                    if toks[j].kind == "punct" and toks[j].text == "(":
                        depth += 1
                    elif toks[j].kind == "punct" and toks[j].text == ")":
                        depth -= 1
                    j += 1
            elif j < len(toks) and toks[j].kind in ("word", "qident", "bident"):
                # dotted relation chain: name (. name)*
                j += 1
                while (
                    j + 1 < len(toks)
                    and toks[j].kind == "punct"
                    and toks[j].text == "."
                    and toks[j + 1].kind in ("word", "qident", "bident")
                ):
                    j += 2
            else:
                continue
            if j < len(toks) and toks[j].kind == "word" and toks[j].text.lower() == "as":
                j += 1
            if (
                j < len(toks)
                and toks[j].kind == "word"
                and toks[j].text.lower() not in _NON_ALIAS
                and toks[j].text.lower() not in KEYWORDS
                and len(toks[j].text) < 3
            ):
                findings.append(
                    LintFinding(
                        "short-alias",
                        toks[j].line,
                        f"alias '{toks[j].text}' shorter than 3 chars",
                    )
                )
        if t.kind == "qident":
            inner = t.text[1:-1]
            if re.fullmatch(r"[a-z_][a-z0-9_]*", inner):
                findings.append(
                    LintFinding(
                        "unneeded-quotes",
                        t.line,
                        f'identifier "{inner}" does not need quotes',
                    )
                )
    findings.sort(key=lambda f: (f.line, f.rule))
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
