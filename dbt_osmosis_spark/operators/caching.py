"""Operator cache scoping.

Several operators ``persist()`` an intermediate frame (minhash signatures,
LSH assignments, span windows) because the frame feeds 2+ plan branches of
the *returned* DataFrame.  The operator cannot unpersist before returning
— the caller has not collected yet and the cache is exactly what makes the
multi-branch plan cheap — so release has to happen *after* the terminal
action, which only the caller sees.

The discipline: operators register every persisted frame with
:func:`keep_cached`; the registry dispatch (``operators.register``) calls
:func:`release_caches` on entry to every query, so a long-lived session
(serve, workbench, the 128-query parity harness) holds at most one
operator's cached frames at a time instead of accumulating all of them
until ``clearCache``.  Callers that want a hard floor (soak tests, bench
group boundaries) call :func:`release_caches` directly.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_PENDING: list[DataFrame] = []
_LOCK = threading.Lock()  # serve/workbench threads share one registry


def keep_cached(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for deferred release.

    The frame stays cached while the *current* operator's result is built
    and collected; it is unpersisted when the next registered operator
    starts (or when :func:`release_caches` is called explicitly).
    """
    df = df.persist()
    with _LOCK:
        _PENDING.append(df)
    return df


def track_cache(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed frame for deferred release."""
    with _LOCK:
        _PENDING.append(df)
    return df


def release_caches() -> int:
    """Unpersist every frame registered since the last release.

    Returns the number of frames released.  Blocking=False: the executor
    blocks are dropped asynchronously; correctness never depends on the
    cache — a concurrent thread whose frame is released mid-build only
    recomputes, which is why the wire/workbench servers serialize Spark
    work behind their own per-process lock in the first place.
    """
    with _LOCK:
        pending, _PENDING[:] = _PENDING[:], []
    n = 0
    for df in reversed(pending):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
