"""Skew-mitigation primitives: salted aggregation and salted joins.

AQE's skew-join splitting (on in `session.py`) handles most runtime skew;
these helpers cover the two cases AQE can't:

- **salted_agg**: a groupBy where one key holds a large share of all rows
  (power-law event streams). A single reducer would own that key's whole
  partition. Two-phase: salt the key into ``n_salts`` subkeys (map-side,
  uniform), partial-aggregate per (key, salt), then final-aggregate per key
  — the hot key's work spreads over ``n_salts`` reducers and the second
  shuffle carries only ``n_salts`` rows per key.
- **salted_broadcast_left**: replicate the *small* side across salts so a
  skewed big side still joins without any single-task hotspot, when
  broadcast alone is not possible (medium dim) — big side salts uniformly,
  small side explodes ×n_salts. One shuffle, bounded per-task input.

Both compose from pure DataFrame ops; Catalyst still plans partial
aggregation inside each phase.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name → *decomposable* aggregate over the
    input (sum/count/min/max — anything where agg(agg(parts)) == agg(whole);
    avg must be expressed as sum+count by the caller).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(f"_p_{name}") for name, a in aggs.items()]
    )

    def _refold(name: str, a: Column) -> Column:
        # re-fold partials with the matching combiner
        fn = a._jc.toString().split("(")[0].lower()
        p = F.col(f"_p_{name}")
        if fn.startswith("count") or fn.startswith("sum"):
            return F.sum(p).alias(name)
        if fn.startswith("min"):
            return F.min(p).alias(name)
        if fn.startswith("max"):
            return F.max(p).alias(name)
        raise ValueError(f"non-decomposable aggregate for salting: {fn}")

    return partial.groupBy(*keys).agg(
        *[_refold(name, a) for name, a in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join a skewed big side with a medium small side: big gets a
    uniform salt, small is replicated across all salts, join key becomes
    (key, salt). Output columns = big ⋈ small minus helper columns."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "_salt"]).drop("_salt")
