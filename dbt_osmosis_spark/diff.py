"""Schema diff: YAML docs vs live Spark schema (SURVEY M27).

Ports the reference's diff semantics (reference: src/dbt_osmosis/core/diff.py):
- Added / Removed column sets (:244-402)
- rename detection by fuzzy similarity — WRatio >= 85 with rapidfuzz in the
  reference (:429-479, threshold :231); stdlib difflib ratio >= 0.85 here
- type-change classification into families (:486-525): integer, float,
  text, boolean, timestamp, date, numeric
- integer narrowing order bigint > int > smallint > tinyint (:527-565)
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass, field
from enum import Enum

RENAME_THRESHOLD = 0.85  # reference: diff.py:231 (WRatio >= 85.0)

_FAMILIES = {
    "integer": {"tinyint", "smallint", "int", "integer", "bigint", "long"},
    "float": {"float", "double", "real"},
    "text": {"string", "varchar", "char", "text"},
    "boolean": {"boolean", "bool"},
    "timestamp": {"timestamp", "timestamp_ntz", "timestamp_ltz"},
    "date": {"date"},
    "numeric": {"decimal", "numeric"},
}

_INT_WIDTH = {"tinyint": 1, "smallint": 2, "int": 3, "integer": 3, "bigint": 4, "long": 4}


def type_family(t: str | None) -> str:
    base = (t or "").lower().split("(")[0].strip()
    for fam, members in _FAMILIES.items():
        if base in members:
            return fam
    return "other"


class ChangeSeverity(Enum):
    SAFE = "safe"
    WARNING = "warning"
    BREAKING = "breaking"


@dataclass
class ColumnChange:
    kind: str  # added | removed | renamed | type_changed
    column: str
    old: str | None = None
    new: str | None = None
    severity: ChangeSeverity = ChangeSeverity.SAFE


@dataclass
class SchemaDiff:
    model: str
    changes: list[ColumnChange] = field(default_factory=list)

    @property
    def breaking(self) -> bool:
        return any(c.severity == ChangeSeverity.BREAKING for c in self.changes)


def classify_type_change(old: str, new: str) -> ChangeSeverity:
    """(reference: diff.py:486-565)"""
    fo, fn = type_family(old), type_family(new)
    if fo == fn:
        if fo == "integer":
            ow = _INT_WIDTH.get(old.lower().split("(")[0], 0)
            nw = _INT_WIDTH.get(new.lower().split("(")[0], 0)
            return ChangeSeverity.BREAKING if nw < ow else ChangeSeverity.SAFE
        return ChangeSeverity.SAFE
    if (fo, fn) in {("integer", "float"), ("integer", "numeric"), ("float", "numeric"),
                    ("integer", "text"), ("float", "text"), ("numeric", "text"),
                    ("date", "timestamp")}:
        return ChangeSeverity.WARNING
    return ChangeSeverity.BREAKING


def diff_columns(
    model: str,
    documented: dict[str, str | None],
    live: dict[str, str],
) -> SchemaDiff:
    """documented: column -> declared type (may be None); live: column ->
    actual type."""
    diff = SchemaDiff(model=model)
    added = [c for c in live if c not in documented]
    removed = [c for c in documented if c not in live]

    # rename pairing: best fuzzy match among added x removed
    # (reference: diff.py:429-479)
    paired: set[str] = set()
    for old in list(removed):
        scored = sorted(
            (
                (difflib.SequenceMatcher(None, old.lower(), new.lower()).ratio(), new)
                for new in added
                if new not in paired
            ),
            reverse=True,
        )
        if scored and scored[0][0] >= RENAME_THRESHOLD:
            ratio, new = scored[0]
            paired.add(new)
            removed.remove(old)
            added.remove(new)
            diff.changes.append(
                ColumnChange("renamed", old, old=old, new=new, severity=ChangeSeverity.WARNING)
            )

    for c in added:
        diff.changes.append(ColumnChange("added", c, new=live[c], severity=ChangeSeverity.SAFE))
    for c in removed:
        diff.changes.append(
            ColumnChange("removed", c, old=documented.get(c), severity=ChangeSeverity.BREAKING)
        )
    for c in documented:
        if c in live and documented[c]:
            old_t = str(documented[c]).lower()
            new_t = live[c].lower()
            if old_t != new_t:
                diff.changes.append(
                    ColumnChange(
                        "type_changed",
                        c,
                        old=old_t,
                        new=new_t,
                        severity=classify_type_change(old_t, new_t),
                    )
                )
    return diff
