"""Test-pattern mining + doc coverage/discovery + doc-style mining
(SURVEY M31, M32, M33).

- suggest_tests: bucket existing per-column tests by column-name pattern
  (`*_id`, `*_date`, `is_*`, ...) and data-type family, count frequencies,
  emit suggestions with confidence (reference:
  src/dbt_osmosis/core/test_suggestions.py:108-342; pattern fn :216-247).
- coverage_stats / find_documentation_gaps / priority_score: gap detection
  (missing/poor/generic descriptions) and prioritization by DAG fan-out,
  source bonus, column count (reference:
  src/dbt_osmosis/core/discovery.py:147-344, :479-521).
- mine_doc_style: description length stats, common phrases, tone markers
  (reference: src/dbt_osmosis/core/voice_learning.py:27-367).

Counters over manifest metadata → driver-side. At 100 TB-scale *project*
sizes (millions of columns) the same folds become
`df.groupBy("pattern","test").count()` over a (node, column, attr) DataFrame;
the heuristics below stay identical.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

GENERIC_DESCRIPTIONS = {
    "",
    "todo",
    "tbd",
    "n/a",
    "none",
    "pending documentation",
    "no description",
}

_PATTERNS: list[tuple[str, str]] = [
    (r".*_id$|^id$", "id"),
    (r".*_(date|at|time|ts)$", "temporal"),
    (r"^(is|has|was|should)_.*", "boolean_flag"),
    (r".*_(amount|price|total|cost|revenue)$", "monetary"),
    (r".*_(count|qty|quantity|num)$", "count"),
    (r".*(email).*", "email"),
    (r".*_(status|state|type|segment|category)$", "categorical"),
]

_DEFAULT_TESTS: dict[str, list[str]] = {
    "id": ["unique", "not_null"],
    "temporal": ["not_null"],
    "boolean_flag": ["not_null", "accepted_values"],
    "monetary": ["not_null"],
    "count": ["not_null"],
    "email": ["not_null"],
    "categorical": ["accepted_values"],
}


def column_pattern(name: str) -> str | None:
    low = name.lower()
    for rx, label in _PATTERNS:
        if re.match(rx, low):
            return label
    return None


@dataclass
class TestSuggestion:
    node: str
    column: str
    test: str
    confidence: float
    reason: str


def suggest_tests(
    columns_of: dict[str, dict[str, dict]],
    existing_tests: dict[tuple[str, str], list[str]] | None = None,
) -> list[TestSuggestion]:
    """Mine `existing_tests` {(node, column): [test names]} for per-pattern
    frequency, then propose the dominant tests for uncovered columns of the
    same pattern (falling back to the built-in defaults)."""
    existing_tests = existing_tests or {}
    freq: dict[str, Counter] = {}
    pattern_total: Counter = Counter()
    for (node, col), tests in existing_tests.items():
        pat = column_pattern(col)
        if pat is None:
            continue
        pattern_total[pat] += 1
        for t in tests:
            freq.setdefault(pat, Counter())[t] += 1

    out: list[TestSuggestion] = []
    for node, cols in sorted(columns_of.items()):
        for col in sorted(cols):
            pat = column_pattern(col)
            if pat is None:
                continue
            have = set(existing_tests.get((node, col), []))
            mined = freq.get(pat)
            if mined and pattern_total[pat] >= 2:
                candidates = [
                    (t, n / pattern_total[pat])
                    for t, n in mined.most_common()
                    if n / pattern_total[pat] >= 0.5
                ]
                reason = f"mined: {pattern_total[pat]} '{pat}' columns in project"
            else:
                candidates = [(t, 0.4) for t in _DEFAULT_TESTS[pat]]
                reason = f"default for '{pat}' pattern"
            for test, conf in candidates:
                if test not in have:
                    out.append(TestSuggestion(node, col, test, round(min(conf, 0.99), 2), reason))
    return out


@dataclass
class CoverageStats:
    total_columns: int
    documented: int
    missing: list[tuple[str, str]] = field(default_factory=list)
    generic: list[tuple[str, str]] = field(default_factory=list)

    @property
    def pct(self) -> float:
        return 100.0 * self.documented / self.total_columns if self.total_columns else 100.0


def coverage_stats(columns_of: dict[str, dict[str, dict]]) -> CoverageStats:
    total = documented = 0
    missing: list[tuple[str, str]] = []
    generic: list[tuple[str, str]] = []
    for node, cols in sorted(columns_of.items()):
        for col, meta in sorted(cols.items()):
            total += 1
            desc = (meta.get("description") or "").strip().lower()
            if not desc:
                missing.append((node, col))
            elif desc in GENERIC_DESCRIPTIONS or len(desc) < 8:
                generic.append((node, col))
            else:
                documented += 1
    return CoverageStats(total, documented, missing, generic)


def priority_score(manifest, node: str, columns_of: dict[str, dict[str, dict]]) -> float:
    """Fan-out (downstream dependents) + source-adjacency bonus + column
    count: nodes whose docs propagate farthest first (reference:
    src/dbt_osmosis/core/discovery.py:479-521)."""
    dependents = sum(1 for m in manifest.models.values() if node in m.depends_on)
    model = manifest.models.get(node)
    source_bonus = (
        2.0
        if model and any(d in manifest.sources or d in manifest.seeds for d in model.depends_on)
        else 0.0
    )
    n_cols = len(columns_of.get(node, {}))
    return dependents * 3.0 + source_bonus + min(n_cols, 20) * 0.1


def find_documentation_gaps(
    manifest, columns_of: dict[str, dict[str, dict]]
) -> list[tuple[str, float, list[str]]]:
    """[(node, priority, [undocumented columns])] sorted by priority desc."""
    gaps = []
    for node, cols in columns_of.items():
        undocumented = [
            c
            for c, meta in cols.items()
            if (meta.get("description") or "").strip().lower() in GENERIC_DESCRIPTIONS
        ]
        if undocumented:
            gaps.append((node, priority_score(manifest, node, columns_of), sorted(undocumented)))
    return sorted(gaps, key=lambda g: (-g[1], g[0]))


_WORD_RE = re.compile(r"[a-zA-Z][a-zA-Z']+")


@dataclass
class DocStyle:
    n_descriptions: int
    avg_len: float
    common_phrases: list[tuple[str, int]]
    tone_markers: dict[str, int]
    terminology: dict[str, str] = field(default_factory=dict)
    column_samples: list[str] = field(default_factory=list)

    def to_prompt_context(self, max_examples: int = 3) -> str:
        """Render the mined style as LLM prompt context (reference:
        voice_learning.py ProjectStyleProfile.to_prompt_context)."""
        lines = [
            f"Project documentation style ({self.n_descriptions} existing docs):",
            f"- average length: {self.avg_len:.0f} chars",
        ]
        dominant = [k for k, v in sorted(self.tone_markers.items(), key=lambda kv: -kv[1]) if v][:2]
        if dominant:
            lines.append(f"- tone: {', '.join(dominant)}")
        if self.terminology:
            prefs = ", ".join(f"'{p}' over '{a}'" for p, a in self.terminology.items())
            lines.append(f"- preferred terms: {prefs}")
        for d in self.column_samples[:max_examples]:
            lines.append(f"- example: {d}")
        return "\n".join(lines)


# the variation sets the reference's terminology detector weighs
# (voice_learning.py:154-192): first item preferred if it dominates
_TERM_VARIATIONS = [
    ("user", "customer", "client", "account"),
    ("id", "identifier", "key"),
    ("email", "email address", "e-mail"),
    ("timestamp", "datetime", "created at", "updated at"),
    ("foreign key", "reference", "ref"),
    ("primary key", "main id", "unique identifier"),
]

_IMPERATIVE_VERBS = ("contains", "represents", "stores", "holds", "tracks", "records", "identifies")
_PASSIVE_PATTERNS = ("is used to", "is a", "contains a", "represents a")
_TECH_TERMS = ("id", "key", "fk", "pk", "timestamp", "json", "uuid", "integer", "varchar")


def mine_doc_style(columns_of: dict[str, dict[str, dict]], top_k: int = 10) -> DocStyle:
    """Length stats + bigram phrase frequency + tone markers + terminology
    preferences over existing descriptions — the corpus future synthesized
    docs should blend into (reference: voice_learning.py:27-367)."""
    descriptions = [
        meta.get("description") or ""
        for cols in columns_of.values()
        for meta in cols.values()
        if (meta.get("description") or "").strip()
    ]
    bigrams: Counter = Counter()
    tone = {
        "imperative": 0,
        "passive": 0,
        "concise": 0,
        "detailed": 0,
        "technical": 0,
        "sentence_case": 0,
        "ends_period": 0,
    }
    for d in descriptions:
        low = d.lower()
        words = [w.lower() for w in _WORD_RE.findall(d)]
        bigrams.update(zip(words, words[1:]))
        if d[:1].isupper():
            tone["sentence_case"] += 1
        if d.rstrip().endswith("."):
            tone["ends_period"] += 1
        if len(words) <= 5:
            tone["concise"] += 1
        elif len(words) >= 15:
            tone["detailed"] += 1
        if any(v in low for v in _IMPERATIVE_VERBS):
            tone["imperative"] += 1
        if any(p in low for p in _PASSIVE_PATTERNS):
            tone["passive"] += 1
        if any(t in low for t in _TECH_TERMS):
            tone["technical"] += 1

    all_text = " ".join(descriptions).lower()
    terminology: dict[str, str] = {}
    for preferred, *alts in _TERM_VARIATIONS:
        pref_n = all_text.count(preferred)
        for alt in alts:
            if pref_n > all_text.count(alt) and pref_n >= 2:
                terminology[preferred] = alt
    return DocStyle(
        n_descriptions=len(descriptions),
        avg_len=round(sum(map(len, descriptions)) / len(descriptions), 1) if descriptions else 0.0,
        common_phrases=[(" ".join(k), v) for k, v in bigrams.most_common(top_k) if v > 1],
        tone_markers=tone,
        terminology=terminology,
        column_samples=sorted(descriptions, key=len)[: top_k // 2],
    )


def find_similar_documented_nodes(
    columns_of: dict[str, dict[str, dict]],
    target_node: str,
    max_results: int = 5,
) -> list[tuple[str, float]]:
    """Well-documented nodes structurally similar to `target_node`, scored
    by column-count proximity (0-0.3) + documentation ratio (0-0.7)
    (reference: voice_learning.py:307-366). Their docs feed style examples
    for synthesis prompts."""
    target_cols = columns_of.get(target_node, {})
    n_target = len(target_cols)
    out: list[tuple[str, float]] = []
    for node, cols in columns_of.items():
        if node == target_node or not cols:
            continue
        documented = [
            m for m in cols.values()
            if (m.get("description") or "").strip().lower() not in GENERIC_DESCRIPTIONS
        ]
        if len(documented) < len(cols) / 2:
            continue
        col_sim = max(0.0, 1 - abs(len(cols) - n_target) / max(n_target, len(cols), 1))
        score = col_sim * 0.3 + (len(documented) / len(cols)) * 0.7
        out.append((node, round(score, 4)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:max_results]


def extract_style_examples(
    columns_of: dict[str, dict[str, dict]],
    target_node: str | None = None,
    max_examples: int = 3,
) -> list[str]:
    """Column-doc examples for LLM prompts — from nodes similar to the
    target when given, else from the overall project style
    (reference: voice_learning.py:367-430)."""
    if target_node is not None:
        examples: list[str] = []
        for node, _score in find_similar_documented_nodes(columns_of, target_node, max_examples):
            for col, meta in list(columns_of[node].items())[:3]:
                desc = (meta.get("description") or "").strip()
                if desc and desc.lower() not in GENERIC_DESCRIPTIONS:
                    examples.append(f"- {col}: {desc}")
        return examples[: max_examples * 3]
    style = mine_doc_style(columns_of)
    return [f"- {d}" for d in style.column_samples[:max_examples]]
