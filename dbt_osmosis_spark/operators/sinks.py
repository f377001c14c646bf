"""Concurrent independent sink jobs (optimization guide §2.6).

The index build/ingest operators end in several INDEPENDENT write jobs
(postings, termset, doclen, stats) that all derive from one persisted
in-flight relation. Driver code calling them sequentially serializes the
cluster: each job's straggler tail leaves every other core idle while
the next job waits on the driver. Spark's scheduler happily runs several
jobs at once inside one application — actions are only sequential
because driver code calls them sequentially — so these sinks are
submitted from a small thread pool and the next job's tasks back-fill
executors freed by the previous job's tail.

Correctness notes:
- Every sink writes to its OWN directory (idempotent overwrite), so
  ordering between them is irrelevant; the exactly-once replay contract
  is unchanged.
- Concurrent materialization of a shared persisted relation is safe:
  the block manager computes each cached partition once and other
  threads wait for it.
- Job descriptions/groups are thread-local in Spark, so concurrently
  submitted sinks stay individually labelled in the UI.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

# 2-3 jobs in flight is plenty (guide §2.6): enough to fill the tail,
# not so many that they fight for executors.
_MAX_INFLIGHT = 3


def run_sinks(*thunks: Callable[[], None]) -> None:
    """Run independent write jobs concurrently; re-raise the first
    failure after every job has finished (no partially-awaited pool).

    Exit exceptions (KeyboardInterrupt/SystemExit) propagate promptly —
    waiting for every in-flight Spark job before honoring Ctrl-C would
    defer it for the full job duration. Ordinary sink failures are
    collected so every job still completes; the first is re-raised with
    any later ones attached as __context__ (round 14, ADVICE r13)."""
    if len(thunks) <= 1:
        for t in thunks:
            t()
        return
    with ThreadPoolExecutor(max_workers=min(_MAX_INFLIGHT, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        errs = []
        for f in futures:
            try:
                f.result()
            except (KeyboardInterrupt, SystemExit):
                for rest in futures:
                    rest.cancel()
                raise
            except Exception as exc:  # noqa: BLE001 - collected and re-raised
                errs.append(exc)
        if errs:
            for cur, nxt in zip(errs, errs[1:]):
                cur.__context__ = nxt
            raise errs[0]
