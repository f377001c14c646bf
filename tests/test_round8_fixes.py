"""Round-8 regression tests.

Covers the driver-session timestamp-type gap (r7's only failures) and the
round-7 advisor items: NULL-safe histogram binning, CMS zero-for-unseen
estimates, and sign-aware q78 cent rounding.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbt_osmosis_spark.functions.timeutil import epoch_us, epoch_us_sql


# ---------------------------------------------------------------------------
# epoch_us: type-agnostic, timezone-free on NTZ, == unix_micros on LTZ+UTC
# ---------------------------------------------------------------------------
NTZ_CASES = [
    "2024-03-10 02:30:00.123456",  # inside the US DST spring-forward gap
    "2024-11-03 01:30:00.5",  # inside the US DST fall-back overlap
    "2024-07-01 12:00:00",
    "1969-12-31 23:59:59.000001",  # pre-epoch: negative micros
    "2024-07-01 00:35:00",  # minute=35/36 brackets the INT32 overflow edge
    "2024-07-01 00:36:00",
    "2024-07-01 23:59:59.999999",
]


def _naive_epoch_us(s: str) -> int:
    dt = datetime.datetime.fromisoformat(s).replace(tzinfo=datetime.timezone.utc)
    return round(dt.timestamp() * 1_000_000)


def test_epoch_us_on_ntz_matches_naive_epoch(spark):
    """On TIMESTAMP_NTZ, epoch_us is the naive epoch — DuckDB's epoch_us —
    bit-for-bit, including sub-second micros and pre-epoch values.

    The driver's default-config session reads parquet timestamps as NTZ
    (r7: q55/q65/q66 died on unix_micros there); this is the contract
    that keeps sessionization/RFM/CUPED identical under both sessions.
    """
    rows = " UNION ALL ".join(f"SELECT TIMESTAMP_NTZ'{s}' AS ts" for s in NTZ_CASES)
    df = spark.sql(rows)
    assert str(df.schema["ts"].dataType) == "TimestampNTZType()"
    got = [r[0] for r in df.select(epoch_us("ts")).collect()]
    assert got == [_naive_epoch_us(s) for s in NTZ_CASES]


def test_epoch_us_on_ltz_matches_unix_micros(spark):
    """On TIMESTAMP under the engine's UTC session, epoch_us == unix_micros
    (the legacy path every pre-r8 oracle run used)."""
    rows = " UNION ALL ".join(
        f"SELECT TIMESTAMP'{s}' AS ts" for s in NTZ_CASES
    )
    df = spark.sql(rows)
    pairs = df.select(epoch_us("ts").alias("a"), F.expr("unix_micros(ts)").alias("b")).collect()
    assert all(r.a == r.b for r in pairs)


def test_epoch_us_accepts_aggregate_fragment(spark):
    """epoch_us_sql substitutes arbitrary expressions (q72 feeds MAX(...))."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts"
        " UNION ALL SELECT TIMESTAMP_NTZ'2024-01-02 00:00:00' AS ts"
    )
    got = df.selectExpr(
        f"({epoch_us_sql('MAX(ts)')} - {epoch_us_sql('MIN(ts)')}) AS d"
    ).collect()[0].d
    assert got == 86_400_000_000


def test_session_break_flag_resolves_on_ntz(spark):
    """The shared sessionization rule (q15/q55/q66) analyzes and runs when
    ts is TIMESTAMP_NTZ — the exact r7 driver failure."""
    from pyspark.sql.window import Window as W

    from dbt_osmosis_spark.operators.relational import session_break_flag

    df = spark.sql(
        "SELECT * FROM VALUES"
        " (1L, TIMESTAMP_NTZ'2024-01-01 00:00:00', 1L),"
        " (2L, TIMESTAMP_NTZ'2024-01-01 00:29:59.999999', 1L),"
        " (3L, TIMESTAMP_NTZ'2024-01-01 01:00:00.000001', 1L)"
        " AS t(event_id, ts, user_id)"
    )
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    flags = [
        r[0]
        for r in df.select(session_break_flag(order).alias("f"))
        .orderBy("event_id")
        .collect()
    ]
    # 30:00.000002 gap > 30 min -> event 3 starts a new session
    assert flags == [1, 0, 1]


def test_no_ltz_only_epoch_functions_in_package():
    """Static gate: unix_micros/unix_seconds/unix_millis hard-fail on
    TIMESTAMP_NTZ, which is what the driver's default-config session reads
    parquet timestamps as. Operator code must go through
    functions/timeutil.epoch_us instead (r7: q55/q65/q66 died on this)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "dbt_osmosis_spark"
    bad = re.compile(r"unix_(micros|seconds|millis)\s*\(")
    offenders = []
    for path in pkg.rglob("*.py"):
        if path.name == "timeutil.py":
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if bad.search(line) and not line.lstrip().startswith("#"):
                # NB: docstring mentions without a trailing "(" (e.g.
                # "epoch_us (not unix_micros) so ...") never match the
                # regex in the first place — only call sites get here.
                offenders.append(f"{path.relative_to(pkg.parent)}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


# ---------------------------------------------------------------------------
# histogram: NULL/NaN values must not enter the bins or the totals
# ---------------------------------------------------------------------------
def test_histogram_cells_drop_null_and_nan(spark):
    from dbt_osmosis_spark.streaming.histogram import batch_histogram_cells

    df = spark.sql(
        "SELECT * FROM VALUES"
        " ('click', 4.0), ('click', CAST(NULL AS DOUBLE)),"
        " ('click', CAST('NaN' AS DOUBLE)), ('click', 8.0)"
        " AS t(event_type, value)"
    )
    cells = batch_histogram_cells(df).collect()
    assert all(c.bin is not None for c in cells)
    assert sum(c.cnt for c in cells) == 2  # only the two real values


# ---------------------------------------------------------------------------
# CMS: never-seen and partially-seen words estimate 0, seen words survive
# ---------------------------------------------------------------------------
def test_cms_estimate_zero_for_unseen_word(spark):
    from dbt_osmosis_spark.streaming.sketch import batch_cell_counts, estimate_counts

    docs = spark.sql(
        "SELECT * FROM VALUES"
        " (1L, 'alpha beta alpha', 'en', 's', 16L)"
        " AS t(doc_id, text, lang, source, n_chars)"
    )
    sketch = batch_cell_counts(docs)
    words = spark.createDataFrame(
        [("alpha",), ("beta",), ("never_in_corpus_zzz",)], ["word"]
    )
    est = {r.word: r.est_n for r in estimate_counts(sketch, words).collect()}
    assert set(est) == {"alpha", "beta", "never_in_corpus_zzz"}
    assert est["never_in_corpus_zzz"] == 0
    # CMS overestimates but never underestimates true counts
    assert est["alpha"] >= 2 and est["beta"] >= 1


# ---------------------------------------------------------------------------
# q78 cents: floor-division half-up matches DuckDB `//` on negative sums
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    ("micros", "want_cents"),
    [
        (14_999, 1),  # 1.4999 cents -> 1
        (15_000, 2),  # exactly 1.5 -> 2 (half-up)
        (-14_999, -1),  # -1.4999 -> -1 (DuckDB floor), NOT 0 (trunc)
        (-15_000, -1),  # exactly -1.5 + 0.5 = -1
        (-15_001, -2),
        (0, 0),
        (5_000, 1),  # exactly half rounds up
    ],
)
def test_half_up_cents_sign_aware(spark, micros, want_cents):
    got = spark.sql(
        f"SELECT CAST((({micros} + 5000) - pmod({micros} + 5000, 10000))"
        " DIV 10000 AS BIGINT) AS c"
    ).collect()[0].c
    assert got == want_cents
