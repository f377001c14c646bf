"""Spread-aware cross-round bench comparator.

    python bench_compare.py [current.json]   # default: bench_out.json

Reads every committed BENCH_r*.json (the driver's per-round records,
skipping unparseable ones) plus the current run, and prints, per query:
the cross-round best, the current value, the ratio, and a verdict that
respects the measured noise floor — a delta inside the run's own
min/max spread (the in-band `spread` field bench.py emits) or inside
the historical same-code band (SCALE.md's three-run measurement:
per-query 1.5x) is NOISE, not a regression. This automates the reading
every round's verdict performs manually, so a regression is visible the
moment it is introduced instead of at judgment time.
"""

from __future__ import annotations

import glob
import json
import os
import sys

# Same-code noise band measured in SCALE.md (three identical runs, one
# afternoon): per-query spread reached 1.5x. Anything under this vs the
# cross-round best is indistinguishable from host noise.
NOISE_BAND = 1.5

# Queries whose pre-r5 minima rode cross-rep cache reuse (VERDICT r5,
# "methodology break"): their old bests are not reachable by an honest
# execution and are excluded when the historical record was measured
# under the old methodology. Every other query stayed comparable.
CACHE_FLATTERED = {"d03_minhash_lsh_pairs", "p18_training_corpus",
                   "p24_dsir_select", "d13_semantic_dedup"}


def _load(path: str) -> dict | None:
    try:
        with open(path) as f:
            text = f.read().strip()
    except OSError:
        return None
    # driver records wrap the run as {"n":…, "tail":…, "parsed": {…}};
    # local bench_out.json is the bare record
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if isinstance(doc.get("parsed"), dict):
                return doc["parsed"]
            if "queries" in doc:
                return doc
        return None
    except ValueError:
        pass
    # a truncated artifact (the r5 failure mode): salvage the last
    # parseable {...} line from the tail capture
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                if isinstance(rec, dict) and "queries" in rec:
                    return rec
            except ValueError:
                continue
    return None


def _history(repo: str) -> list[dict]:
    """Every committed historical record: the driver's BENCH_r*.json
    (compact summaries from r7 on — headline queries only) plus
    bench_history.jsonl, the append-only full-record log bench.py keeps
    so extended/families timings and spread triples survive the driver's
    bounded tail capture."""
    recs: list[dict] = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        rec = _load(path)
        if rec is not None:  # e.g. the truncated r5 artifact
            recs.append(rec)
    hist = os.path.join(repo, "bench_history.jsonl")
    if os.path.exists(hist):
        with open(hist) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if isinstance(rec, dict) and "queries" in rec:
                    recs.append(rec)
    return recs


def _spread_bounds(rec: dict) -> dict[str, tuple[float, float]]:
    """Per-query (min, max) rep times from the record's in-band spread.

    bench.py has emitted two shapes over the rounds: [min, median, max]
    triples (current) and {"min": ..., "max": ...} dicts (early r5-era
    experiments) — accept both.
    """
    out: dict[str, tuple[float, float]] = {}
    for name, s in (rec.get("spread") or {}).items():
        if isinstance(s, (list, tuple)) and len(s) >= 2:
            try:
                out[name] = (float(s[0]), float(s[-1]))
            except (TypeError, ValueError):
                continue
        elif isinstance(s, dict) and s.get("min") and s.get("max"):
            out[name] = (float(s["min"]), float(s["max"]))
    return out


def _queries(rec: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for block in ("queries", "extended", "families"):
        vals = rec.get(block) or {}
        if isinstance(vals, dict):
            out.update(
                {k: float(v) for k, v in vals.items() if isinstance(v, (int, float))}
            )
    return out


def main() -> int:
    repo = os.path.dirname(os.path.abspath(__file__))
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "bench_out.json")
    cur = _load(cur_path)
    if cur is None:
        print(f"cannot parse {cur_path}", file=sys.stderr)
        return 2

    best: dict[str, float] = {}
    hist_spread_max: dict[str, float] = {}
    n_hist = n_skipped = 0
    cur_meth = cur.get("methodology")
    for rec in _history(repo):
        same_meth = rec.get("methodology") == cur_meth
        if not same_meth:
            n_skipped += 1  # counted as partially comparable below
        n_hist += 1
        for name, v in _queries(rec).items():
            if v <= 0:
                continue
            if not same_meth and name in CACHE_FLATTERED:
                continue  # old best rode the cache; not honestly reachable
            best[name] = min(best.get(name, v), v)
        # historical rep spread (bench.py emits [min, median, max] triples
        # per query): the max-of-spread is a time this exact code has
        # honestly taken on this host, so a current best-of-rep at or
        # under it is host noise by demonstration, not by threshold
        # (VERDICT r9 item 2 — makes benign drift like t22 0.40->0.91 s
        # machine-distinguishable from a real plan regression).
        for name, lo_hi in _spread_bounds(rec).items():
            if name not in CACHE_FLATTERED or same_meth:
                hist_spread_max[name] = max(hist_spread_max.get(name, 0.0), lo_hi[1])

    rows = []
    regressions = 0
    for name, v in sorted(_queries(cur).items()):
        b = best.get(name)
        if b is None or b <= 0:
            rows.append((name, None, v, None, "NEW"))
            continue
        ratio = v / b
        band = NOISE_BAND
        lo_hi = _spread_bounds(cur).get(name)
        if lo_hi and lo_hi[0] > 0:
            # the run's own rep spread widens the band when the host was noisy
            band = max(band, lo_hi[1] / lo_hi[0])
        if ratio <= band or v <= hist_spread_max.get(name, 0.0):
            verdict = "ok"
        else:
            verdict = "REGRESSION?"
            regressions += 1
        rows.append((name, b, v, ratio, verdict))

    width = max(len(r[0]) for r in rows) if rows else 10
    print(
        f"history: {n_hist} records (BENCH_r*.json + bench_history.jsonl;"
        f" {n_skipped} pre-methodology-break: cache-flattered queries excluded);"
        f" noise band {NOISE_BAND}x, or inside any historical rep spread"
    )
    for name, b, v, ratio, verdict in rows:
        bs = f"{b:7.3f}" if b is not None else "      -"
        rs = f"{ratio:5.2f}x" if ratio is not None else "     -"
        print(f"  {name:<{width}}  best {bs}  now {v:7.3f}  {rs}  {verdict}")
    # host-load context next to the verdict (VERDICT r11 item 7): a run
    # under neighbor load shows a high loadavg and a depressed spin rate,
    # so an inflated headline self-identifies as environmental.
    host = cur.get("host") or {}
    for tag in ("before", "after"):
        probe = host.get(tag) or {}
        if probe:
            print(
                f"host {tag}: loadavg {probe.get('loadavg')}"
                f"  spin {probe.get('spin_iters_per_ms')} iters/ms"
            )
    print(f"{regressions} out-of-band quer{'y' if regressions == 1 else 'ies'}")
    return 1 if regressions else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` is a fine way to read this
        sys.exit(0)
