"""Property-based tests (hypothesis) for driver-side invariants.

The reference lists hypothesis as a dev dependency but never uses it
(SURVEY §5); here the pure-Python planes — topo sort, settings resolution,
diff, schema validation, text heuristics — get randomized coverage.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_osmosis_spark.project import Manifest, ModelNode
from dbt_osmosis_spark.schema_validation import validate_schema_doc
from dbt_osmosis_spark.settings import SettingsResolver
from dbt_osmosis_spark.suggestions import column_pattern, coverage_stats

names = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@st.composite
def dags(draw):
    """Random DAG: node i may depend only on nodes < i (acyclic by
    construction)."""
    n = draw(st.integers(min_value=1, max_value=12))
    models = {}
    for i in range(n):
        deps = draw(
            st.lists(st.integers(min_value=0, max_value=i - 1), max_size=3, unique=True)
        ) if i else []
        models[f"m{i}"] = ModelNode(
            name=f"m{i}", raw_sql="select 1", path=f"m{i}.sql",
            depends_on=[f"m{d}" for d in deps],
        )
    return Manifest(models=models)


@given(dags())
@settings(max_examples=50, deadline=None)
def test_topo_sort_parents_always_first(manifest):
    order = manifest.topo_sort()
    assert sorted(order) == sorted(manifest.models)
    pos = {n: i for i, n in enumerate(order)}
    for name, node in manifest.models.items():
        for dep in node.depends_on:
            assert pos[dep] < pos[name]


@given(dags())
@settings(max_examples=20, deadline=None)
def test_topo_sort_deterministic(manifest):
    assert manifest.topo_sort() == manifest.topo_sort()


@given(
    key=st.sampled_from(["output-to-lower", "sort_by", "skip-add-tags"]),
    value=st.one_of(st.booleans(), st.text(max_size=5), st.integers()),
    spelling=st.sampled_from(["kebab", "snake", "prefixed", "options"]),
)
@settings(max_examples=100, deadline=None)
def test_settings_resolver_finds_any_spelling(key, value, spelling):
    kebab = key.replace("_", "-")
    snake = key.replace("-", "_")
    meta = {
        "kebab": {kebab: value},
        "snake": {snake: value},
        "prefixed": {f"dbt-osmosis-{kebab}": value},
        "options": {"dbt-osmosis-options": {kebab: value}},
    }[spelling]

    class _N:
        config = {"meta": meta}

    got = SettingsResolver().resolve(key, node=_N())
    assert got == value


@given(
    st.dictionaries(
        names,
        st.dictionaries(
            names,
            st.fixed_dictionaries({"description": st.text(max_size=20)}),
            max_size=5,
        ),
        max_size=5,
    )
)
@settings(max_examples=50, deadline=None)
def test_coverage_stats_partition_is_total(columns_of):
    stats = coverage_stats(columns_of)
    n = sum(len(cols) for cols in columns_of.values())
    assert stats.total_columns == n
    assert stats.documented + len(stats.missing) + len(stats.generic) == n
    assert 0.0 <= stats.pct <= 100.0


@given(st.text(alphabet="abcdefghijklmnop_", min_size=1, max_size=24))
@settings(max_examples=100, deadline=None)
def test_column_pattern_total_or_none(name):
    pat = column_pattern(name)
    assert pat is None or isinstance(pat, str)


@given(
    st.recursive(
        st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=8)),
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=8), children, max_size=4),
        ),
        max_leaves=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_schema_validator_never_crashes(doc):
    # fuzz: arbitrary YAML-shaped values must produce violations, not raises
    if isinstance(doc, dict):
        violations = validate_schema_doc(doc)
        assert isinstance(violations, list)


# ---- contracts: type normalization ----------------------------------------

_TYPE_BASES = [
    "text", "varchar", "char", "string", "int", "integer", "bigint", "long",
    "smallint", "tinyint", "float", "real", "double", "double precision",
    "bool", "boolean", "date", "timestamp", "numeric", "decimal",
]


@given(
    base=st.sampled_from(_TYPE_BASES),
    args=st.one_of(
        st.none(),
        st.tuples(st.integers(1, 38), st.integers(0, 18)).map(
            lambda t: f"({t[0]},{min(t)})"
        ),
        st.integers(1, 4096).map(lambda n: f"({n})"),
    ),
    shout=st.booleans(),
)
def test_normalize_type_idempotent_and_case_free(base, args, shout):
    from dbt_osmosis_spark.contracts import normalize_type

    s = base + (args or "")
    n1 = normalize_type(s.upper() if shout else s)
    assert normalize_type(n1) == n1  # idempotent
    assert n1 == normalize_type(s)  # case-insensitive


# ---- state fingerprints ----------------------------------------------------

@given(
    sql=st.text(min_size=1, max_size=200),
    cfg=st.dictionaries(
        st.text(st.characters(categories=("Ll",)), min_size=1, max_size=8),
        st.one_of(st.integers(), st.text(max_size=10), st.booleans()),
        max_size=5,
    ),
)
def test_fingerprint_stable_under_config_ordering_and_sql_sensitive(sql, cfg):
    from dbt_osmosis_spark.project import Manifest, ModelNode
    from dbt_osmosis_spark.state import fingerprint

    def mk(s, c):
        m = Manifest()
        m.models["m"] = ModelNode(name="m", raw_sql=s, path="models/m.sql", config=c)
        return m

    f1 = fingerprint(mk(sql, cfg))
    f2 = fingerprint(mk(sql, dict(reversed(list(cfg.items())))))
    assert f1 == f2  # dict ordering never matters
    f3 = fingerprint(mk(sql + "x", cfg))
    assert f1["model:m"] != f3["model:m"]  # any body edit is detected


@st.composite
def rich_manifests(draw):
    """Random manifests exercising the artifact writer/loader surface:
    models with deps/config/tags/columns, seeds, sources (with and without
    paths), hooks, exposures."""
    n = draw(st.integers(min_value=1, max_value=8))
    models = {}
    for i in range(n):
        deps = (
            draw(st.lists(st.integers(min_value=0, max_value=i - 1), max_size=3, unique=True))
            if i
            else []
        )
        models[f"m{i}"] = ModelNode(
            name=f"m{i}",
            raw_sql=draw(st.text(alphabet="selct from1 ", min_size=1, max_size=30)),
            path=f"models/m{i}.sql",
            materialized=draw(st.sampled_from(["view", "table", "ephemeral", "incremental"])),
            depends_on=sorted(f"m{d}" for d in deps),
            description=draw(st.text(max_size=20)),
            tags=draw(st.lists(names, max_size=2, unique=True)),
            config=draw(
                st.dictionaries(names, st.one_of(st.integers(), st.booleans(), names), max_size=3)
            ),
            columns=[
                {"name": c, "description": draw(st.text(max_size=10))}
                for c in draw(st.lists(names, max_size=3, unique=True))
            ],
            meta=draw(st.dictionaries(names, st.integers(), max_size=2)),
        )
    from dbt_osmosis_spark.project import SeedNode, SourceNode

    manifest = Manifest(models=models, project_name=draw(names))
    for s in draw(st.lists(names, max_size=2, unique=True)):
        manifest.seeds[s] = SeedNode(name=s, path=f"seeds/{s}.csv")
    for s in draw(st.lists(names, max_size=2, unique=True)):
        key = f"raw.{s}"
        manifest.sources[key] = SourceNode(
            name=key,
            path=draw(st.one_of(st.none(), st.just(f"data/{s}.parquet"))),
            schema="raw",
        )
    manifest.on_run_start = draw(st.lists(st.just("select 1"), max_size=2))
    manifest.exposures = {
        e: {"type": "dashboard", "owner": {}, "description": "", "depends_on": []}
        for e in draw(st.lists(names, max_size=1, unique=True))
    }
    return manifest


@given(rich_manifests())
@settings(max_examples=40, deadline=None)
def test_manifest_artifact_roundtrip_property(manifest):
    """write -> load of the public artifact schema preserves the graph:
    node sets, dependency edges, materializations, configs, columns,
    descriptions, hooks, and declared-only sources."""
    import json
    import tempfile
    from pathlib import Path

    from dbt_osmosis_spark.artifacts import load_manifest_json, write_manifest_json

    with tempfile.TemporaryDirectory() as td:
        art = Path(td) / "manifest.json"
        write_manifest_json(manifest, art)
        json.loads(art.read_text())  # valid JSON on disk
        m2 = load_manifest_json(art)
    assert set(m2.models) == set(manifest.models)
    assert set(m2.seeds) == set(manifest.seeds)
    assert set(m2.sources) == set(manifest.sources)
    for name, node in manifest.models.items():
        got = m2.models[name]
        assert got.depends_on == sorted(node.depends_on), name
        assert got.materialized == node.materialized, name
        assert got.description == node.description, name
        assert sorted(got.tags) == sorted(node.tags), name
        assert {c["name"] for c in got.columns if isinstance(c, dict)} == {
            c["name"] for c in node.columns
        }, name
        assert got.meta == node.meta, name
    for key, src in manifest.sources.items():
        assert (m2.sources[key].path is None) == (src.path is None), key
    assert m2.on_run_start == manifest.on_run_start
    assert set(m2.exposures) == set(manifest.exposures)


# ---- round-3 operator properties (pure-python mirrors, no Spark) -----------


@given(
    st.lists(st.binary(min_size=1, max_size=400), min_size=1, max_size=20),
)
@settings(max_examples=30, deadline=None)
def test_phash_bit_pack_matches_reference(payloads):
    """The vectorized gather/threshold/pack must equal a per-row reference
    implementation for arbitrary byte payloads."""
    import numpy as np

    bits_n = 60
    lens = np.fromiter((len(d) for d in payloads), dtype=np.int64, count=len(payloads))
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = starts[:, None] + (np.arange(bits_n)[None, :] * lens[:, None]) // bits_n
    pixels = flat[idx]
    mean = pixels.sum(axis=1).astype(np.float64)[:, None] / bits_n
    hashes = (pixels > mean).astype(np.int64) @ (
        np.int64(1) << np.arange(bits_n, dtype=np.int64)
    )
    for row, data in enumerate(payloads):
        px = [data[(i * len(data)) // bits_n] for i in range(bits_n)]
        m = sum(px) / bits_n
        expect = sum(1 << i for i, p in enumerate(px) if p > m)
        assert hashes[row] == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from("abcde")),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=30, deadline=None)
def test_global_order_offsets_are_a_permutation(rows):
    """p19's bucket-offset construction (per-bucket rank + cumulative
    offsets) must yield exactly 0..n-1 and agree with the single-sort
    definition, for any bucket assignment."""
    import hashlib

    def mk(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    # single-sort reference
    ref = {
        doc: pos
        for pos, (doc, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], mk(t[0]), t[0]))
        )
    }
    # bucket construction
    buckets = sorted({b for _, b in rows})
    offsets, acc = {}, 0
    for b in buckets:
        offsets[b] = acc
        acc += sum(1 for _, bb in rows if bb == b)
    got = {}
    for b in buckets:
        members = sorted((d for d, bb in rows if bb == b), key=lambda d: (mk(d), d))
        for r, d in enumerate(members):
            got[d] = offsets[b] + r
    assert got == ref
    assert sorted(got.values()) == list(range(len(rows)))


@given(st.binary(min_size=128, max_size=1024))
@settings(max_examples=30, deadline=None)
def test_audio_feature_math_matches_reference(data):
    """m06's sum-of-squares variance and scaled-integer zero-crossing test
    must equal the direct mean-centered definitions per frame."""
    import math

    n = 128
    for f in range(len(data) // n):
        x = list(data[f * n : (f + 1) * n])
        s, ss = sum(x), sum(v * v for v in x)
        var = ss / n - (s / n) * (s / n)
        mean = s / n
        direct_var = sum((v - mean) ** 2 for v in x) / n
        assert math.isclose(var, direct_var, rel_tol=1e-9, abs_tol=1e-6)
        zc_scaled = sum(
            1
            for i in range(n - 1)
            if (x[i] * n - s) * (x[i + 1] * n - s) < 0
        )
        zc_direct = sum(
            1
            for i in range(n - 1)
            if (x[i] - mean) * (x[i + 1] - mean) < 0
            and (x[i] != mean and x[i + 1] != mean)
        )
        assert zc_scaled == zc_direct


def test_inlined_lsh_ivf_constants_match_md5_formula():
    """The driver-inlined plane/centroid literals (similarity.py) must be
    bit-identical to the md5-in-SQL formula they replaced — evaluated here
    in DuckDB, the oracle engine. If a constant ever drifted, every
    IVF/LSH oracle would silently diverge from its historical results."""
    import duckdb

    from dbt_osmosis_spark.operators.similarity import (
        _CENT_VALS,
        _DIM,
        _N_CELLS,
        _P,
        _PLANE_VALS,
    )

    con = duckdb.connect()
    cent = con.execute(
        f"""SELECT c, d,
              (CAST('0x' || substr(md5('ivf' || CAST(c AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT)
               % 2001 - 1000) / 1000.0
            FROM range(0, {_N_CELLS}) t1(c), range(0, {_DIM}) t2(d)"""
    ).fetchall()
    for c, d, v in cent:
        assert _CENT_VALS[c][d] == v, (c, d)
    plane = con.execute(
        f"""SELECT p, d,
              (CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15) AS BIGINT)
               % 2001 - 1000) / 1000.0
            FROM range(0, {_P}) t1(p), range(0, {_DIM}) t2(d)"""
    ).fetchall()
    for p, d, v in plane:
        assert _PLANE_VALS[p][d] == v, (p, d)


@given(
    st.lists(st.integers(min_value=-1_000_000, max_value=1_000_000), max_size=60)
)
def test_capped_balance_window_identity(deltas):
    """q77's core: B_i = max(0, B_{i-1} + d_i) equals S_i - min(0, min_j S_j)
    for EVERY prefix, on arbitrary integer delta sequences."""
    b = 0
    s = 0
    run_min = 0
    for d in deltas:
        b = max(0, b + d)
        s += d
        run_min = min(run_min, s)
        assert b == s - min(0, run_min)
