"""Round-9 operator invariants: q84 rolling z-score anomalies."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_osmosis_spark.operators import QUERIES, load_all

load_all()


def _mk_events(spark, tmp_path, rows):
    """rows: (event_id, t_sec, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    tab = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(tab, str(d / "events.parquet"))
    return str(d)


def test_q84_flags_constructed_spike_and_dev_cents_exact(spark, tmp_path):
    """12 quiet events at ~$10 then one $400 spike inside the window: the
    spike (and only rows that really cross 3 sigma) is flagged, and
    dev_cents equals the Python integer recomputation."""
    rows = [(i, i * 60, "click", 10.0 + (i % 3) * 0.5) for i in range(12)]
    rows.append((12, 12 * 60, "click", 400.0))
    sf = _mk_events(spark, tmp_path, rows)
    got = QUERIES["q84_rolling_zscore_anomalies"](spark, sf).collect()
    assert [r.event_id for r in got] == [12]
    r = got[0]
    cents = [int(round(v * 100)) for _, _, _, v in rows]
    n = 13
    s = sum(cents)
    assert r.win_n == n
    assert r.dev_cents == abs(cents[12] * n - s) // n
    # and the test really is 3-sigma: recompute in exact ints
    q = sum(c * c for c in cents)
    assert (cents[12] * n - s) ** 2 > 9 * (n * q - s * s)


def test_q84_quiet_series_flags_nothing(spark, tmp_path):
    rows = [(i, i * 60, "view", 20.0 + (i % 5) * 0.25) for i in range(40)]
    sf = _mk_events(spark, tmp_path, rows)
    assert QUERIES["q84_rolling_zscore_anomalies"](spark, sf).count() == 0


def test_q84_window_is_per_type_and_time_bounded(spark, tmp_path):
    """A spike whose 72 h window holds only same-type events: other-type
    noise must not dilute the baseline, and events older than 72 h must
    not count toward win_n."""
    rows = []
    # 15 old 'click' events, > 72 h before the spike — outside its frame
    for i in range(15):
        rows.append((i, i * 60, "click", 10.0))
    base_t = 15 * 60 + 300_000  # ~3.5 days later
    # 14 fresh quiet clicks + loud 'view' noise interleaved
    for i in range(14):
        rows.append((100 + i, base_t + i * 60, "click", 10.0))
        rows.append((200 + i, base_t + i * 60 + 1, "view", 300.0 + i))
    rows.append((999, base_t + 14 * 60, "click", 400.0))
    sf = _mk_events(spark, tmp_path, rows)
    got = {r.event_id: r for r in QUERIES["q84_rolling_zscore_anomalies"](spark, sf).collect()}
    assert 999 in got
    assert got[999].win_n == 15  # 14 fresh quiet + itself; old 15 excluded


def test_q84_plan_single_window_exchange(spark, sf_dir):
    from dbt_osmosis_spark.plans.audit import exchange_count, physical_plan

    df = QUERIES["q84_rolling_zscore_anomalies"](spark, sf_dir)
    # one hash exchange for the per-type LINEAR cumulative window over
    # the event+probe union, one for the event_id re-pairing aggregate,
    # plus the final presentation range sort. (The former single-window
    # sliding RANGE frame was O(rows x frame) in Spark — it hung the
    # 100x probe — so one extra linear shuffle buys away the quadratic.)
    assert exchange_count(df) <= 3
    assert "hashpartitioning(event_type" in physical_plan(df)
    # and the quadratic frame is really gone: cumulative frames print as
    # unboundedpreceding$(); a bounded "-259200000000" lower bound would
    # mean the sliding frame came back
    assert "-259200000000" not in physical_plan(df)


# ---------------------------------------------------------------------------
# d30: incremental connected-components maintenance
# ---------------------------------------------------------------------------
def test_d30_equals_d06_full_recompute(spark, sf_dir):
    """The maintenance theorem, checked directly: incremental contracted
    relabel == full-corpus CC, row for row."""
    inc = QUERIES["d30_incremental_components"](spark, sf_dir).collect()
    full = QUERIES["d06_dedup_components"](spark, sf_dir).collect()
    assert sorted(map(tuple, inc)) == sorted(map(tuple, full))


def test_d30_contracted_graph_is_new_edge_bounded(spark, sf_dir):
    """The star CC must run on a graph bounded by the new-edge endpoints,
    never the corpus: rebuild the contraction inline and compare node
    count against the corpus size."""
    from dbt_osmosis_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    bb = lsh_bands(minhash_signatures(batch))
    cb = lsh_bands(minhash_signatures(base))
    within = lsh_candidate_pairs(bb)
    cross = (
        bb.alias("b")
        .join(
            cb.alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_key") == F.col("c.band_key")),
        )
        .select(F.col("b.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
        .distinct()
    )
    n_new_edges = within.count() + cross.count()
    n_corpus = docs.count()
    # every contracted node is an endpoint of a new edge
    assert 2 * n_new_edges < n_corpus, (
        "fixture drift: new-edge endpoints should be far smaller than the "
        f"corpus for the incremental claim to mean anything ({n_new_edges} "
        f"edges vs {n_corpus} docs)"
    )


def test_d30_no_cartesian_and_no_full_cc_over_union(spark, sf_dir):
    from dbt_osmosis_spark.plans.audit import has_cartesian

    df = QUERIES["d30_incremental_components"](spark, sf_dir)
    assert not has_cartesian(df)


# ---------------------------------------------------------------------------
# t25: interpolated Kneser-Ney scoring
# ---------------------------------------------------------------------------
def test_t25_kn_distribution_normalizes_exactly(spark, sf_dir):
    """The KN guarantee: for any prefix v, sum over the model's vocab of
    P(w|v) is EXACTLY 1 — checked in exact rationals with the same
    integer terms the operator uses. (Interpolated KN normalizes over
    the continuation distribution; with the integerized form the sum is
    a Fraction identity, so any drift means the arithmetic is wrong.)"""
    from fractions import Fraction

    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    rows = docs.select("text").limit(200).collect()
    big: dict[tuple[str, str], int] = {}
    for r in rows:
        w = r.text.strip().split(" ")
        for i in range(len(w) - 1):
            big[(w[i], w[i + 1])] = big.get((w[i], w[i + 1]), 0) + 1
    bt = len(big)
    cv: dict[str, int] = {}
    n1p: dict[str, int] = {}
    n1c: dict[str, int] = {}
    vocab_followers: set[str] = set()
    for (a, b), n in big.items():
        cv[a] = cv.get(a, 0) + n
        n1p[a] = n1p.get(a, 0) + 1
        n1c[b] = n1c.get(b, 0) + 1
        vocab_followers.add(b)
    # P(w|v) defined over the continuation vocab (every word with >= 1
    # predecessor); the discount mass redistributes over exactly that set
    prefixes = sorted(cv, key=lambda a: -cv[a])[:5]
    for v in prefixes:
        total = Fraction(0)
        for w in vocab_followers:
            n2 = big.get((v, w), 0)
            num = max(4 * n2 - 3, 0) * bt + 3 * n1p[v] * n1c[w]
            total += Fraction(num, 4 * cv[v] * bt)
        assert total == 1, (v, total)


def test_t25_corpus_entropy_not_below_true_mle(spark, sf_dir):
    """Smoothing gives mass away: the CORPUS-LEVEL (token-weighted) KN
    cross-entropy can never be below the UNsmoothed bigram MLE on the
    same counts — per prefix, c(vw)/c(v) is the entropy minimizer.
    (Per-document the inequality does NOT hold — a doc of
    high-continuation bigrams can gain more interpolation mass than the
    discount removes, observed at up to 0.065 bits — and t13 is add-0.5
    smoothed, not MLE, so KN may legitimately beat IT; the bound is
    against MLE recomputed here from raw counts.)"""
    import math

    from dbt_osmosis_spark.sources.parquet import read_parquet

    kn_rows = QUERIES["t25_kneser_ney"](spark, sf_dir).collect()
    kn_total = sum(r.n_bigrams * r.score_bits for r in kn_rows)
    kn_n = sum(r.n_bigrams for r in kn_rows)

    big: dict[tuple[str, str], int] = {}
    cv: dict[str, int] = {}
    for r in read_parquet(spark, f"{sf_dir}/documents.parquet").select("text").collect():
        w = r.text.strip().split(" ")
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            big[(w[i], w[i + 1])] = big.get((w[i], w[i + 1]), 0) + 1
            cv[w[i]] = cv.get(w[i], 0) + 1
    mle_total = sum(n * math.log2(cv[a] / n) for (a, _), n in big.items())
    mle_n = sum(big.values())
    assert kn_n == mle_n
    # tolerance covers the 1e-9 qlp quantization + per-doc round(.,6)
    assert kn_total / kn_n >= mle_total / mle_n - 1e-4


# ---------------------------------------------------------------------------
# q85: CUSUM drift detection
# ---------------------------------------------------------------------------
def test_q85_cusum_matches_direct_recurrence(spark, sf_dir):
    """Recompute C_i = max(0, C_{i-1} + d_i) directly in Python over the
    gap-filled series and compare every alarm row — the q77 identity,
    re-proven on this operator's scaled units."""
    from dbt_osmosis_spark.functions.timeutil import epoch_us_sql
    from dbt_osmosis_spark.operators.relational import t as load_t

    ev = load_t(spark, sf_dir, "events").selectExpr(
        "event_type", f"{epoch_us_sql('ts')} DIV 3600000000 AS h"
    )
    rows = ev.collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.h)
    expected = []
    for et, hs in by_type.items():
        h0, h1 = min(hs), max(hs)
        cnt: dict[int, int] = {}
        for h in hs:
            cnt[h] = cnt.get(h, 0) + 1
        H = h1 - h0 + 1
        T = len(hs)
        c = 0
        for h in range(h0, h1 + 1):
            x = cnt.get(h, 0)
            c = max(0, c + 2 * H * x - 3 * T)
            if c > 4 * T:
                expected.append((et, h, x, c))
    got = [
        (r.event_type, r.hour_idx, r.x, r.cusum_scaled)
        for r in QUERIES["q85_cusum_drift"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expected)


def test_q85_burst_alarms_and_silence_resets(spark, tmp_path):
    rows = []
    eid = 0
    for h in range(48):
        rows.append((eid, h * 3600, "click", 1.0)); eid += 1
    for h in range(120, 132):
        for k in range(10):
            rows.append((eid, h * 3600 + k * 60, "click", 1.0)); eid += 1
    sf = _mk_events(spark, tmp_path, rows)
    got = QUERIES["q85_cusum_drift"](spark, sf).collect()
    assert got, "sustained 10x burst must alarm"
    # hour indexes are absolute epoch-hours; the constructed series
    # starts at 2024-01-01 00:00, so the burst occupies offsets 120-131
    h0 = int((__import__("datetime").datetime(2024, 1, 1)
              - __import__("datetime").datetime(1970, 1, 1)).total_seconds()) // 3600
    offsets = sorted(r.hour_idx - h0 for r in got)
    assert all(120 <= o <= 131 for o in offsets), offsets
    # the steady prefix and the silence must NOT alarm
    assert len(offsets) <= 12


def test_t27_matches_direct_rake_recomputation(spark, sf_dir):
    """Recompute RAKE end-to-end in plain Python (exact Fractions for
    word scores, then the same 1e-9 half-up quantization) from the raw
    text and require the top-25 to agree exactly."""
    from collections import Counter, defaultdict
    import math

    docs = [
        (r.doc_id, r.text.strip().split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    wordfreq = Counter(w for _, ws in docs for w in ws)
    stop = set(
        w for w, _ in sorted(wordfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    )
    freq: Counter = Counter()
    deg: Counter = Counter()
    phrases = []  # (doc_id, tuple(words))
    for doc_id, ws in docs:
        run: list[str] = []
        for w in ws + ["\x00stop"]:
            if w in stop or w == "\x00stop":
                if run:
                    phrases.append((doc_id, tuple(run)))
                    for x in run:
                        freq[x] += 1
                        deg[x] += len(run)
                    run = []
            else:
                run.append(w)
    q = {w: math.floor(deg[w] / freq[w] * 1e9 + 0.5) for w in freq}
    agg: dict = defaultdict(lambda: [0, set(), 0])
    for doc_id, ph in phrases:
        a = agg[" ".join(ph)]
        a[0] += 1
        a[1].add(doc_id)
        a[2] = sum(q[w] for w in ph)
    want = sorted(
        ((p, n, len(ds), s) for p, (n, ds, s) in agg.items()),
        key=lambda t: (-t[3], t[0]),
    )[:25]
    got = [
        (r.phrase, r.n_occurrences, r.n_docs, r.score_nano)
        for r in QUERIES["t27_rake_keyphrases"](spark, sf_dir).collect()
    ]
    assert got == want


def test_t27_no_stopword_inside_any_phrase(spark, sf_dir):
    """Candidate phrases are maximal stopword-free runs: no member word
    of any reported phrase may be one of the top-12 corpus tokens."""
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wordfreq = Counter(w for r in docs for w in r.text.strip().split(" "))
    stop = set(
        w for w, _ in sorted(wordfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    )
    rows = QUERIES["t27_rake_keyphrases"](spark, sf_dir).collect()
    assert rows, "expected at least one keyphrase"
    for r in rows:
        assert not (set(r.phrase.split(" ")) & stop), r.phrase
        # deg >= freq always, so each word scores >= 1e9 and a phrase of
        # L words scores >= L * 1e9
        assert r.score_nano >= len(r.phrase.split(" ")) * 10**9


def _greedy_count(intervals):
    """Reference earliest-deadline greedy over (start, end, id) tuples."""
    sel = []
    last_e = None
    for s, e, i in sorted(intervals, key=lambda t: (t[1], t[0], t[2])):
        if last_e is None or s > last_e:
            sel.append((s, e, i))
            last_e = e
    return sel


def test_q86_matches_direct_greedy_per_customer(spark, sf_dir):
    """Recompute the activity-selection greedy in plain Python from the
    joined intervals and require every output column to agree."""
    from collections import defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate.date())
        for r in read_parquet(spark, f"{sf_dir}/orders.parquet").collect()
    }
    ends = defaultdict(lambda: None)
    for r in read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        d = r.l_shipdate.date()
        if ends[r.l_orderkey] is None or d > ends[r.l_orderkey]:
            ends[r.l_orderkey] = d
    per_cust = defaultdict(list)
    for okey, (ckey, s) in orders.items():
        if okey in ends:
            per_cust[ckey].append((s, max(ends[okey], s), okey))
    got = {
        r.c_custkey: r
        for r in QUERIES["q86_interval_scheduling"](spark, sf_dir).collect()
    }
    assert set(got) == set(per_cust)
    for ckey, ivs in per_cust.items():
        sel = _greedy_count(ivs)
        r = got[ckey]
        assert r.n_windows == len(ivs)
        assert r.n_selected == len(sel)
        assert r.first_start == sel[0][0]
        assert r.last_end == sel[-1][1]
        assert r.utilized_days == sum((e - s).days for s, e, _ in sel)


def test_q86_selected_sets_are_maximum(spark, sf_dir):
    """The greedy count must equal the true optimum (checked by exact DP
    over end-sorted intervals) for every customer — the optimality
    theorem, verified on real data."""
    import bisect
    from collections import defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate.date())
        for r in read_parquet(spark, f"{sf_dir}/orders.parquet").collect()
    }
    ends = {}
    for r in read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        d = r.l_shipdate.date()
        if r.l_orderkey not in ends or d > ends[r.l_orderkey]:
            ends[r.l_orderkey] = d
    per_cust = defaultdict(list)
    for okey, (ckey, s) in orders.items():
        if okey in ends:
            per_cust[ckey].append((s, max(ends[okey], s)))
    got = {
        r.c_custkey: r.n_selected
        for r in QUERIES["q86_interval_scheduling"](spark, sf_dir).collect()
    }
    for ckey, ivs in per_cust.items():
        ivs.sort(key=lambda t: t[1])
        endv = [e for _, e in ivs]
        dp = [0] * (len(ivs) + 1)
        for i, (s, e) in enumerate(ivs, 1):
            # last interval ending before s (strict: next.s > prev.e)
            j = bisect.bisect_left(endv, s, 0, i - 1)
            dp[i] = max(dp[i - 1], dp[j] + 1)
        assert got[ckey] == dp[len(ivs)], ckey


def test_q87_allocations_sum_exactly_to_budget(spark, sf_dir):
    """The Hamilton invariant: SUM(alloc) == budget exactly, every alloc
    within 1 unit of the exact proportional share, and the floor share
    never exceeds alloc."""
    rows = QUERIES["q87_largest_remainder_alloc"](spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == 10000
    total = sum(r.rev_c for r in rows)
    for r in rows:
        exact = 10000 * r.rev_c / total
        assert r.floor_share <= r.alloc <= r.floor_share + 1
        assert r.floor_share == (10000 * r.rev_c) // total
        assert abs(r.alloc - exact) < 1.0, (r.n_name, r.alloc, exact)


def test_q87_leftover_goes_to_largest_remainders(spark, sf_dir):
    """Units beyond the floor shares go to the nations with the largest
    integer remainders (ties by name) — recomputed directly."""
    rows = QUERIES["q87_largest_remainder_alloc"](spark, sf_dir).collect()
    total = sum(r.rev_c for r in rows)
    rem = {r.n_name: (10000 * r.rev_c) % total for r in rows}
    leftover = 10000 - sum((10000 * r.rev_c) // total for r in rows)
    winners = set(
        n for n, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:leftover]
    )
    for r in rows:
        assert (r.alloc - r.floor_share == 1) == (r.n_name in winners), r.n_name


def test_p40_quota_and_selection_invariants(spark, sf_dir):
    """Quotas sum to the budget; taken = min(quota, available); the
    selected set is exactly the md5-lowest `taken` docs of each bucket."""
    import hashlib
    from collections import defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").collect()
    buckets = defaultdict(list)
    for r in docs:
        b = min(len(r.text.strip().split(" ")) // 12, 7)
        buckets[b].append(r.doc_id)
    n = len(docs)
    budget = n // 2
    rows = {r.bucket: r for r in QUERIES["p40_length_matched_sample"](spark, sf_dir).collect()}
    assert sum(r.quota for r in rows.values()) == budget
    for b, r in rows.items():
        avail = buckets.get(b, [])
        assert r.n_docs == len(avail)
        assert r.taken == min(r.quota, len(avail))
        assert r.unfilled == r.quota - r.taken
        want = sorted(
            avail, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )[: r.taken]
        assert r.id_checksum == sum(want)


def test_m15_segments_match_direct_recomputation(spark, sf_dir):
    """Frame energies, the voiced threshold, and the island merge are
    recomputed in plain Python from the raw text bytes."""
    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").collect()
    got = {r.doc_id: r for r in QUERIES["m15_vad_segments"](spark, sf_dir).collect()}
    for r in docs:
        data = r.text.encode()
        n_frames = len(data) // 64
        if n_frames == 0:
            assert r.doc_id not in got
            continue
        voiced = []
        for i in range(n_frames):
            fr = data[i * 64 : (i + 1) * 64]
            s = sum(fr)
            ss = sum(b * b for b in fr)
            voiced.append(64 * ss - s * s >= 890 * 64 * 64)
        segs = []
        run = 0
        first = -1
        for i, v in enumerate(voiced):
            if v:
                if run == 0 and first < 0:
                    pass
                run += 1
                if run == 1:
                    segs.append([i, 0])
                segs[-1][1] += 1
            else:
                run = 0
        g = got[r.doc_id]
        assert g.n_frames == n_frames
        assert g.n_segments == len(segs)
        assert g.voiced_frames == sum(L for _, L in segs)
        assert g.longest_segment == (max((L for _, L in segs), default=0))
        assert g.first_voiced_frame == (segs[0][0] if segs else -1)
        assert g.voiced_bp == sum(L for _, L in segs) * 10000 // n_frames


def test_q88_gini_matches_fraction_exact_recompute(spark, sf_dir):
    """Recompute each nation's Gini with exact Fractions from the raw
    tables; the engine's basis points must equal floor(G * 10000)."""
    from collections import defaultdict
    from fractions import Fraction

    from dbt_osmosis_spark.sources.parquet import read_parquet

    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).collect()
    import math

    rev_by_order = defaultdict(int)
    for r in li:
        rev_by_order[r.l_orderkey] += int(
            math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5)
        )
    orders = {
        r.o_orderkey: r.o_custkey
        for r in read_parquet(spark, f"{sf_dir}/orders.parquet").collect()
    }
    cust_nation = {
        r.c_custkey: r.c_nationkey
        for r in read_parquet(spark, f"{sf_dir}/customer.parquet").collect()
    }
    nation_name = {
        r.n_nationkey: r.n_name
        for r in read_parquet(spark, f"{sf_dir}/nation.parquet").collect()
    }
    cust_rev = defaultdict(int)
    for okey, cents in rev_by_order.items():
        cust_rev[orders[okey]] += cents
    per_nation = defaultdict(list)
    for ckey, x in cust_rev.items():
        per_nation[nation_name[cust_nation[ckey]]].append(x)
    got = {r.n_name: r for r in QUERIES["q88_revenue_gini"](spark, sf_dir).collect()}
    assert set(got) == set(per_nation)
    for name, xs in per_nation.items():
        xs.sort()
        n = len(xs)
        s = sum(xs)
        g = Fraction(2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * s, n * s)
        assert 0 <= g < 1
        r = got[name]
        assert r.n_customers == n
        assert r.total_rev_c == s
        assert r.gini_bp == (g.numerator * 10000) // g.denominator


def test_t28_delta_matches_direct_recompute_and_metric_axioms(spark, sf_dir):
    """Recompute Burrows' Delta in plain Python (same quantization) for
    every source pair; also pin symmetry-free output shape (a < b, all
    C(S,2) pairs present) and non-negativity."""
    import math
    from collections import Counter, defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").collect()
    toks_by_src = defaultdict(list)
    allc = Counter()
    for r in docs:
        ws = [w for w in r.text.lower().split(" ") if w]
        toks_by_src[r.source].extend(ws)
        allc.update(ws)
    topw = [w for w, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:40]]
    sources = sorted(toks_by_src)
    S = len(sources)
    fq = {}
    for s in sources:
        t_s = len(toks_by_src[s])
        c = Counter(toks_by_src[s])
        for w in topw:
            fq[(s, w)] = math.floor(c.get(w, 0) / t_s * 1e9 + 0.5)
    want = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            terms = []
            for w in topw:
                mads = 0
                tot = sum(fq[(s, w)] for s in sources)
                mads = sum(abs(S * fq[(s, w)] - tot) for s in sources)
                if mads == 0:
                    continue
                terms.append(
                    math.floor(S * S * abs(fq[(a, w)] - fq[(b, w)]) / mads * 1e6 + 0.5)
                )
            want[(a, b)] = (len(terms), sum(terms) // len(terms))
    got = {
        (r.source_a, r.source_b): (r.n_words, r.delta_micro)
        for r in QUERIES["t28_burrows_delta"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert got == want
    for (a, b), (nw, dm) in got.items():
        assert a < b and dm >= 0 and 1 <= nw <= 40


def test_m16_gain_matches_direct_recompute_and_inverts_power(spark, sf_dir):
    """Recompute the millibel gain from raw bytes; a clip exactly at the
    target power must gain 0 mb, louder clips negative, quieter positive
    (sign law checked on the real corpus)."""
    import math

    from dbt_osmosis_spark.sources.parquet import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").collect()
    got = {r.doc_id: r for r in QUERIES["m16_gain_staging"](spark, sf_dir).collect()}
    seen = 0
    for r in docs:
        data = r.text.encode()
        n = len(data) // 64
        if n == 0:
            continue
        sum_dev = 0
        for i in range(n):
            fr = data[i * 64 : (i + 1) * 64]
            s = sum(fr)
            ss = sum(b * b for b in fr)
            sum_dev += 64 * ss - s * s
        if sum_dev == 0:
            assert r.doc_id not in got
            continue
        seen += 1
        g = got[r.doc_id]
        assert g.n_frames == n and g.sum_dev == sum_dev
        want = math.floor(1000 * math.log10(900 * 64 * 64 * n / sum_dev) + 0.5)
        assert g.gain_mb == want
        # sign law: mean variance above target => attenuate (negative)
        mean_var = sum_dev / (64 * 64 * n)
        if mean_var > 900 * 10 ** (0.5 / 1000):
            assert g.gain_mb <= 0
        elif mean_var < 900 * 10 ** (-0.5 / 1000):
            assert g.gain_mb >= 0
    assert seen > 0


def test_q89_alignment_preserves_weekday_and_sums(spark, sf_dir):
    """Every compared day pair is exactly 364 days apart (same ISO
    weekday by construction); month sums recomputed directly."""
    import datetime as dt
    import math
    from collections import defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).collect()
    rev_by_order = defaultdict(int)
    for r in li:
        rev_by_order[r.l_orderkey] += int(
            math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5)
        )
    daily = defaultdict(int)
    for r in read_parquet(spark, f"{sf_dir}/orders.parquet").collect():
        if r.o_orderkey in rev_by_order:
            daily[r.o_orderdate.date()] += rev_by_order[r.o_orderkey]
    months = defaultdict(lambda: [0, 0, 0])
    for d, rc in daily.items():
        p = d - dt.timedelta(days=364)
        if p in daily:
            assert p.weekday() == d.weekday()
            m = months[(d.year, d.month)]
            m[0] += 1
            m[1] += rc
            m[2] += daily[p]
    got = {
        (r.yr, r.mo): r
        for r in QUERIES["q89_weekday_aligned_yoy"](spark, sf_dir).collect()
    }
    assert set(got) == set(months)
    for key, (n, rc, pc) in months.items():
        r = got[key]
        assert (r.n_days_aligned, r.rev_c, r.aligned_rev_c) == (n, rc, pc)
        # floor-division semantics of the bp growth, sign-correct for
        # negative growth too (DIV truncates toward zero in both engines
        # only for positive operands; growth can be negative, so pin
        # against the engine's own integer DIV semantics)
        want_bp = (rc - pc) * 10000
        q = want_bp // pc if want_bp >= 0 else -((-want_bp) // pc)
        assert r.yoy_bp == q


def test_round9c_exchange_budgets(spark, sf_dir):
    """Exchange ceilings for the round-9c/d operators, measured at
    sf0.001 (and flat at sf0.1 for the bench families) — a refactor that
    adds a shuffle fails here, not at the next scale probe."""
    from dbt_osmosis_spark.plans.audit import exchange_count

    budgets = {
        "t27_rake_keyphrases": 6,
        "t28_burrows_delta": 22,
        "s37_qld_topk": 16,
        "s38_qld_postings_serve": 7,  # serve plan (the returned df)
        "m15_vad_segments": 3,
        "m16_gain_staging": 2,
        "p40_length_matched_sample": 8,
        "q86_interval_scheduling": 3,
        "q87_largest_remainder_alloc": 4,
        "q88_revenue_gini": 3,
        "q89_weekday_aligned_yoy": 5,
        "d31_degree_mixing_curve": 12,
        "q90_cohort_ltv_curve": 8,
    }
    for name, budget in budgets.items():
        assert exchange_count(QUERIES[name](spark, sf_dir)) <= budget, name


def test_d31_knn_matches_direct_graph_recompute(spark, sf_dir):
    """Rebuild the verified-pair graph via the registered d03 relation,
    recompute knn(k) in plain Python with the same pure-integer rounding,
    and require exact equality."""
    from collections import defaultdict

    edges = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["d03_minhash_lsh_pairs"](spark, sf_dir).collect()
    ]
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    per_k = defaultdict(lambda: [0, 0])
    for v, ns in adj.items():
        per_k[deg[v]][0] += 1
        per_k[deg[v]][1] += sum(deg[n] for n in ns)
    want = []
    for k in sorted(per_k):
        n_k, s = per_k[k]
        d = k * n_k
        want.append((k, n_k, s, (2 * 1000000 * s + d) // (2 * d)))
    got = [
        (r.k, r.n_nodes, r.sum_neighbor_deg, r.knn_micro)
        for r in QUERIES["d31_degree_mixing_curve"](spark, sf_dir).collect()
    ]
    assert got == want
    # handshake identity: sum over k of k*n_k = 2|E|
    assert sum(k * nk for k, nk, _, _ in got) == 2 * len(edges)


def test_q90_ltv_curve_is_cumulative_and_cohort_conserving(spark, sf_dir):
    """Cumulative revenue is non-decreasing in age within each cohort;
    active members never exceed cohort size; age-0 activity equals the
    full cohort (every member orders in their first month by definition);
    total curve revenue equals the corpus revenue."""
    import math
    from collections import defaultdict

    from dbt_osmosis_spark.sources.parquet import read_parquet

    rows = QUERIES["q90_cohort_ltv_curve"](spark, sf_dir).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[(r.cohort_year, r.cohort_month0)].append(r)
    total = 0
    for key, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        assert rs[0].age_months == 0
        assert rs[0].n_active == rs[0].cohort_n, key
        cum = 0
        for r in rs:
            cum += r.rev_c
            assert r.cum_rev_c == cum
            assert r.n_active <= r.cohort_n
            assert r.cum_ltv_per_member_c == cum // r.cohort_n
        total += cum
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_discount", "l_orderkey"
    ).collect()
    okeys = set(
        r.o_orderkey
        for r in read_parquet(spark, f"{sf_dir}/orders.parquet").collect()
    )
    want_total = sum(
        int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
        for r in li
        if r.l_orderkey in okeys
    )
    assert total == want_total
