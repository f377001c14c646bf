"""Deterministic sf1 generator for the scale-slope bench (BENCH `sf1` block).

The driver ships sf0.001/0.01/0.1; proving the flagship operators hold one
order of magnitude up needs a 10x corpus. This generator fits the empirical
distributions of the driver's sf0.1 tables (measured, not assumed):

- documents: i.i.d. tokens from the sf0.1 unigram distribution (31-word
  vocab), token-count and (lang, source) resampled from the observed rows,
  exact-duplicate pairs planted at the observed rate (8 per 5000 docs);
- embeddings: isotropic unit-norm float32 vectors, labels resampled from
  the observed marginal — sf0.1's vectors are exactly this (intra-label
  cosine ~= 0, norm == 1.0, >=0.4 pairs at the random-tail rate 4.6e-4).

- events: user count scales with mult (same per-user rate) over sf0.1's
  fixed ~30-day window, (event_type, value, props) resampled jointly —
  concurrency grows with scale, stressing the sweep-line flagship.

Only the tables the scale flagships read (documents, embeddings, events)
are generated. Output is written under ``.scale/sf1`` (gitignored) and reused
across runs; seed fixed so every round measures the same corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SEED = 42
_BASIS = "/root/testdata/sf0.1"
_DOCS_MULT = 10  # 5 000 -> 50 000 documents
_EMB_MULT = 10  # 2 000 -> 20 000 vectors
_DUP_PAIRS_PER_5K = 8


def _gen_documents(out_path: str, rng: np.random.Generator) -> int:
    base = pq.read_table(f"{_BASIS}/documents.parquet")
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()

    words, counts = np.unique(
        np.concatenate([np.array(t.split()) for t in texts]), return_counts=True
    )
    word_p = counts / counts.sum()
    tok_counts = np.array([len(t.split()) for t in texts])

    n = len(texts) * _DOCS_MULT
    lens = rng.choice(tok_counts, size=n, replace=True)
    meta_idx = rng.integers(0, len(texts), size=n)
    flat = rng.choice(words, size=int(lens.sum()), replace=True, p=word_p)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    docs = [" ".join(flat[offsets[i] : offsets[i + 1]]) for i in range(n)]

    n_dups = _DUP_PAIRS_PER_5K * n // 5000
    victims = rng.choice(n, size=2 * n_dups, replace=False)
    for a, b in zip(victims[:n_dups], victims[n_dups:]):
        docs[int(b)] = docs[int(a)]

    table = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array([langs[i] for i in meta_idx], pa.string()),
            "source": pa.array([sources[i] for i in meta_idx], pa.string()),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    pq.write_table(table, out_path)
    return n


def _gen_embeddings(out_path: str, rng: np.random.Generator) -> int:
    base = pq.read_table(f"{_BASIS}/embeddings.parquet")
    labels = np.asarray(base.column("label").to_pylist())
    dim = len(base.column("embedding")[0])

    n = len(labels) * _EMB_MULT
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lab = rng.choice(labels, size=n, replace=True)

    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "label": pa.array(lab.tolist(), pa.int32()),
        }
    )
    pq.write_table(table, out_path)
    return n


def _gen_events(out_path: str, rng: np.random.Generator, mult: int) -> int:
    """mult-x events: user count scales with the corpus (same per-user
    rate), the time window stays sf0.1's ~30 days — so CONCURRENCY scales,
    which is exactly what the sweep-line flagship must absorb.
    (event_type, value, props) are resampled jointly so their empirical
    dependence structure is preserved; timestamps are uniform over the
    observed window (sf0.1's arrivals are uniform)."""
    base = pq.read_table(f"{_BASIS}/events.parquet")
    n_base = base.num_rows
    n = n_base * mult
    n_users = int(np.asarray(base.column("user_id").to_numpy()).max()) + 1
    ts_us = base.column("ts").cast(pa.int64()).to_numpy()
    lo, hi = int(ts_us.min()), int(ts_us.max())

    idx = rng.integers(0, n_base, size=n)
    ts = np.sort(rng.integers(lo, hi + 1, size=n))
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(base.schema.field("ts").type),
            "user_id": pa.array(rng.integers(0, n_users * mult, size=n), pa.int64()),
            "event_type": base.column("event_type").take(pa.array(idx)).combine_chunks(),
            "value": base.column("value").take(pa.array(idx)).combine_chunks(),
            "props": base.column("props").take(pa.array(idx)).combine_chunks(),
        }
    )
    pq.write_table(table, out_path)
    return n


def ensure_scale(mult: int, repo_root: str | None = None) -> str:
    """Generate (once) and return a ``mult``x-of-sf0.1 directory path."""
    global _DOCS_MULT, _EMB_MULT
    root = repo_root or os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(root, ".scale", f"sf{mult // 10}" if mult % 10 == 0 else f"x{mult}")
    docs = os.path.join(out, "documents.parquet")
    embs = os.path.join(out, "embeddings.parquet")
    evts = os.path.join(out, "events.parquet")
    if os.path.exists(docs) and os.path.exists(embs) and os.path.exists(evts):
        return out
    os.makedirs(out, exist_ok=True)
    saved = (_DOCS_MULT, _EMB_MULT)
    _DOCS_MULT = _EMB_MULT = mult
    try:
        rng = np.random.default_rng(_SEED)
        if not os.path.exists(docs):
            _gen_documents(docs, rng)
        if not os.path.exists(embs):
            _gen_embeddings(embs, rng)
        if not os.path.exists(evts):
            # Dedicated stream so backfilling events into a directory that
            # already has documents/embeddings yields the same bytes as a
            # fresh full generation.
            _gen_events(evts, np.random.default_rng(_SEED + 1), mult)
    finally:
        _DOCS_MULT, _EMB_MULT = saved
    return out


# --- TPC-H fact tiling (round-10 100x probes: q86-q90 read orders/
# lineitem/customer, which the corpus generator above never scaled) -------
#
# Scaling strategy: CLONE TILING — replica i shifts every surrogate key
# (orderkey, custkey) by i * (max_key + 1) and keeps all other columns
# byte-identical. This preserves exactly the properties the probed
# operators depend on: referential integrity (every shifted l_orderkey
# exists in the shifted orders replica), per-customer order timelines
# (q90 cohorts), and the date marginals (q89's weekday alignment) — while
# rows, customers, and per-date arrival rates all scale by `mult`, which
# is how a real 100x fact-table grows against a fixed dimension plane
# (part/supplier/nation keys are NOT shifted: dimensions stay shared).
# Deterministic by construction — no RNG, so re-runs are byte-identical.

_TPCH_KEYS = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
}


def _tile_table(src: str, dst: str, mult: int, shift_cols: tuple[str, ...]) -> int:
    import pyarrow.compute as pc

    base = pq.read_table(src)
    strides = {c: int(pc.max(base.column(c)).as_py()) + 1 for c in shift_cols}
    writer = pq.ParquetWriter(dst, base.schema)
    try:
        for i in range(mult):
            rep = base
            for c, stride in strides.items():
                shifted = pc.add(rep.column(c), pa.scalar(i * stride, pa.int64()))
                rep = rep.set_column(
                    rep.schema.get_field_index(c), rep.schema.field(c), shifted
                )
            writer.write_table(rep)
    finally:
        writer.close()
    return base.num_rows * mult


def ensure_tpch_scale(mult: int, repo_root: str | None = None) -> str:
    """Backfill mult-x orders/lineitem/customer into the ensure_scale dir."""
    out = ensure_scale(mult, repo_root)
    for tbl, keys in _TPCH_KEYS.items():
        dst = os.path.join(out, f"{tbl}.parquet")
        if not os.path.exists(dst):
            _tile_table(f"{_BASIS}/{tbl}.parquet", dst, mult, keys)
    # dimensions stay fixed at scale (the realistic growth mode): copy
    # them through unscaled so any probed operator that joins a dim runs.
    import shutil

    for tbl in ("region", "nation", "part", "supplier"):
        dst = os.path.join(out, f"{tbl}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(f"{_BASIS}/{tbl}.parquet", dst)
    return out


def ensure_sf1(repo_root: str | None = None) -> str:
    """Generate (once) and return the sf1 (10x) directory path."""
    return ensure_scale(10, repo_root)


if __name__ == "__main__":
    print(ensure_sf1())
