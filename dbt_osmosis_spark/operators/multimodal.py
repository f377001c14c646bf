"""Multimodal column plumbing: images/audio/video as opaque binary + metadata.

The Spark-side design is real and tested — schema, partitioning, Arrow batch
shape, UDF signatures; only the *codec* step is stubbed (image/audio libs are
not in this container). At 100 TB the pattern is:

  binary column (parquet) → mapInPandas (Arrow batches of bytes)
    → per-batch decode (PIL/ffmpeg/soundfile in the real container)
    → typed feature columns / resized binary back out

Rules encoded here:
- binary payloads travel in the DataFrame, never through the driver;
- decode happens inside mapInPandas so one Python worker handles an Arrow
  batch at a time (amortized serde, bounded memory = batch size);
- metadata (width/height/codec/duration) is a typed struct column, filterable
  *without* touching bytes — queries that only need metadata never deserialize
  payloads (column pruning keeps the binary column out of the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, format string"
# Flat (one row per feature slot): the harness canonical hash cannot sort
# array cells, and the flat shape partitions/joins cleanly downstream.
FEATURE_SCHEMA = "doc_id long, modality string, n_bytes int, slot int, value float"


class CodecUnavailable(NotImplementedError):
    """Raised by real decoders when the codec library is missing."""


_HAS_PIL: bool | None = None


def codec_available() -> bool:
    """One-time probe for the image codec. Hot loops must branch on this
    instead of calling decode_image() per row and catching CodecUnavailable:
    a FAILED import is not cached by Python, so the per-row try/except costs
    a full sys.path scan plus two exception raises per payload."""
    global _HAS_PIL
    if _HAS_PIL is None:
        try:
            import PIL  # type: ignore  # noqa: F401

            _HAS_PIL = True
        except ImportError:
            _HAS_PIL = False
    return _HAS_PIL


def decode_image(data: bytes) -> "object":
    """Real decoder — requires PIL, which this container does not ship.

    STUB: downstream code paths must catch CodecUnavailable and fall back to
    ``fake_decode_meta`` (deterministic) so pipelines stay testable.
    """
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as e:  # pragma: no cover - PIL absent by design
        raise CodecUnavailable("PIL not available in this environment") from e


def fake_decode_meta(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image header parsing: derives (width,
    height, format) from the payload bytes. Replaces decode_image(...).size
    when the codec is unavailable."""
    w = 16 + (len(data) % 1024)
    h = 16 + (sum(data[:8]) % 1024 if data else 0)
    fmt = "png" if (data[:1] == b"\x89") else "raw"
    return w, h, fmt


def attach_fake_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary `content` column + typed `meta` struct from text
    (the testdata has no real media); schema matches what a real ingest
    (spark.read.format('binaryFile')) would produce."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            (16 + F.length("content") % 1024).cast("int").alias("width"),
            F.lit(16).cast("int").alias("height"),
            F.lit("raw").alias("format"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipelines put the decoder + model forward pass in `one_batch`; here
    the decode is the deterministic fake (CodecUnavailable path), and the
    "feature" is an 8-dim byte-histogram sketch — enough to exercise batch
    shape, schema, and partition parallelism for real.
    """

    import numpy as np

    def one_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fully columnar inside the batch: concatenate the (capped) payloads
        # once, histogram all rows with a single segment-offset bincount
        # (seg*8 + value), and build the output frame from flat arrays — no
        # per-row numpy calls, no iterrows, no Python-object rows. The real
        # decoder runs only when the codec library exists (one probe per
        # worker, not a retried import + exception pair per payload).
        use_real = codec_available()
        for pdf in batches:
            payloads = pdf["content"].to_numpy()
            n_rows = len(payloads)
            if use_real:  # pragma: no cover - codec absent in this container
                for data in payloads:
                    try:
                        decode_image(data)  # real decode; metadata unused here
                    except Exception:  # noqa: BLE001 - undecodable payload
                        fake_decode_meta(data)
            capped = [d[:4096] for d in payloads]
            lens = np.fromiter((len(c) for c in capped), dtype=np.int64, count=n_rows)
            joined = np.frombuffer(b"".join(capped), dtype=np.uint8).astype(np.int64) % 8
            seg = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            flat = np.bincount(seg * 8 + joined, minlength=n_rows * 8).reshape(n_rows, 8)
            feats = flat.astype(np.float64) / np.maximum(lens, 1)[:, None]
            n_bytes = np.fromiter((len(d) for d in payloads), dtype=np.int64, count=n_rows)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(), 8),
                    "modality": "image",
                    "n_bytes": np.repeat(n_bytes, 8),
                    "slot": np.tile(np.arange(8, dtype=np.int32), n_rows),
                    "value": feats.ravel().astype(np.float32),
                }
            )

    return df.select(id_col, "content").mapInPandas(one_batch, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per sampled
    "frame" (byte slice in the stub; ffmpeg seek in real life). Pure
    DataFrame ops — posexplode keeps it distributed and pruned."""
    frames = F.expr(
        f"transform(sequence(0, least(CAST(length(content) / {every_n_bytes} AS INT), {max_frames}) - 1), "
        f"i -> substring(content, i * {every_n_bytes} + 1, {every_n_bytes}))"
    )
    return df.select(
        "doc_id", F.posexplode(frames).alias("frame_no", "frame_bytes")
    ).withColumn("frame_len", F.length("frame_bytes"))


# ---- registered queries ----------------------------------------------------
# The testdata carries no real media, so payloads are manufactured from text
# (attach_fake_payloads) — which makes every stage below oracle-checkable in
# DuckDB (documents.text is pure ASCII: byte == char). The Spark-side shapes
# (binary column, struct metadata, mapInPandas batches, posexplode frames)
# are exactly what a real binary-media pipeline runs.

from pyspark.sql import SparkSession

from dbt_osmosis_spark.operators import register
from dbt_osmosis_spark.sources.parquet import read_parquet, spread


@register(
    "m01_image_meta",
    oracle="""
SELECT doc_id,
       CAST(16 + length(text) % 1024 AS INT) AS width,
       16 AS height,
       'raw' AS format,
       CAST(length(text) AS INT) AS n_bytes
FROM documents
ORDER BY doc_id
""",
)
def m01_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query: filter/project on the typed struct without ever
    deserializing payload bytes (column pruning drops `content`)."""
    docs = attach_fake_payloads(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return docs.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.format").alias("format"),
        F.length("content").cast("int").alias("n_bytes"),
    ).orderBy("doc_id")


_M02_ORACLE = """
WITH slotted AS (
  SELECT doc_id, length(text) AS L,
         list_transform(range(1, least(length(text), 4096) + 1),
                        i -> ascii(substr(text, CAST(i AS INT), 1)) % 8) AS slots
  FROM documents
)
SELECT doc_id, 'image' AS modality, CAST(L AS INT) AS n_bytes,
       CAST(s AS INT) AS slot,
       CAST(len(list_filter(slots, x -> x = s))
            / greatest(least(L, 4096), 1)::DOUBLE AS FLOAT) AS value
FROM slotted, UNNEST(range(0, 8)) AS t(s)
ORDER BY doc_id, slot
"""


@register("m02_feature_extract", oracle=_M02_ORACLE)
def m02_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode→featurize over binary payloads (mapInPandas)."""
    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    return extract_features(docs).orderBy("doc_id", "slot")


_FRAME_BYTES = 64
_MAX_FRAMES = 4

_M03_ORACLE = f"""
WITH framed AS (
  SELECT doc_id,
         CAST(i AS INT) AS frame_no,
         substr(text, CAST(i * {_FRAME_BYTES} + 1 AS INT), {_FRAME_BYTES}) AS frame
  FROM documents,
       UNNEST(range(0, greatest(least(length(text) // {_FRAME_BYTES}, {_MAX_FRAMES}), 0))) AS t(i)
)
SELECT doc_id, frame_no,
       CAST(length(frame) AS INT) AS frame_len,
       md5(frame) AS frame_md5
FROM framed
ORDER BY doc_id, frame_no
"""


@register("m03_frame_sample", oracle=_M03_ORACLE)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled byte-slice "frame",
    emitted via posexplode — fully distributed, no payload through driver."""
    docs = attach_fake_payloads(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    n_frames = F.expr(
        f"greatest(least(CAST(length(content) / {_FRAME_BYTES} AS INT), {_MAX_FRAMES}), 0)"
    )
    frames = F.when(
        n_frames > 0,
        F.expr(
            f"transform(sequence(0, greatest(least(CAST(length(content) / {_FRAME_BYTES} AS INT), {_MAX_FRAMES}), 1) - 1), "
            f"i -> substring(content, i * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))"
        ),
    ).otherwise(F.expr("array()"))
    return (
        docs.select("doc_id", F.posexplode(frames).alias("frame_no", "frame_bytes"))
        .select(
            "doc_id",
            "frame_no",
            F.length("frame_bytes").cast("int").alias("frame_len"),
            F.md5("frame_bytes").alias("frame_md5"),
        )
        .orderBy("doc_id", "frame_no")
    )


# ---- m04: resize / downsample (Arrow-batched thumbnailing) -----------------
# The resize step of an image/audio pipeline: payload bytes mean-pool into
# a fixed number of buckets (a thumbnail for images, a resample for audio).
# The REAL resize (PIL.Image.resize / librosa.resample) slots into the same
# batch loop behind decode_image; the deterministic byte-pooling stand-in
# keeps the Spark plumbing — Arrow batch shape, numpy vectorization, flat
# typed output — real and oracle-checkable. Integer floor-mean in both
# engines, so the oracle is value-hash exact.

_M04_BUCKETS = 32
RESIZE_SCHEMA = "doc_id long, pos int, value int, n_bytes int"


def resize_payloads(df: DataFrame, id_col: str = "doc_id", buckets: int = _M04_BUCKETS) -> DataFrame:
    """Mean-pool each payload's bytes into ≤`buckets` cells: one output row
    per (doc, cell). Strided `np.add.reduceat` per payload — vectorized
    pooling, columnar batch output, no per-byte Python."""
    import numpy as np

    def one_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, vals, sizes = [], [], [], []
            for doc_id, data in zip(pdf[id_col].to_numpy(), pdf["content"].to_numpy()):
                arr = np.frombuffer(data, dtype=np.uint8)
                n = len(arr)
                if n == 0:
                    continue
                stride = -(-n // buckets)  # ceil
                offsets = np.arange(0, n, stride)
                sums = np.add.reduceat(arr.astype(np.int64), offsets)
                counts = np.diff(np.append(offsets, n))
                pooled = sums // counts  # floor-mean, integer-exact
                k = len(pooled)
                ids.append(np.full(k, doc_id, dtype=np.int64))
                poss.append(np.arange(k, dtype=np.int32))
                vals.append(pooled.astype(np.int32))
                sizes.append(np.full(k, n, dtype=np.int32))
            if not ids:
                yield pd.DataFrame({"doc_id": [], "pos": [], "value": [], "n_bytes": []})
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "value": np.concatenate(vals),
                    "n_bytes": np.concatenate(sizes),
                }
            )

    return df.select(id_col, "content").mapInPandas(one_batch, schema=RESIZE_SCHEMA)


# content = encode(text, 'utf-8') and the corpus is ASCII, so byte i of the
# payload is ascii(substr(text, i+1, 1)) in DuckDB.
_M04_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text, length(text) AS L,
         CAST(ceil(length(text) / {_M04_BUCKETS}.0) AS BIGINT) AS stride
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(p AS INT) AS pos,
       CAST(floor(
         list_sum(list_transform(range(p * stride, least((p + 1) * stride, L)),
                  i -> ascii(substr(text, CAST(i + 1 AS INT), 1))))
         / (least((p + 1) * stride, L) - p * stride)) AS INT) AS value,
       CAST(L AS INT) AS n_bytes
FROM b, UNNEST(range(0, {_M04_BUCKETS})) AS t(p)
WHERE p * stride < L
ORDER BY doc_id, pos
"""


@register("m04_resize", oracle=_M04_ORACLE)
def m04_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.sources.parquet import read_parquet, spread

    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    return resize_payloads(docs).orderBy("doc_id", "pos")


# ---- m05: perceptual-hash (aHash) near-dup detection over payloads ---------
# The image-dedup staple: sample the payload down to a tiny fixed grid,
# threshold against the grid mean, pack the bits — visually-identical
# payloads (resizes, re-encodes) collide. Real pipelines decode + grayscale
# + 8x8-resize inside the batch (PIL path, gated by codec_available); the
# stub samples 60 evenly-spaced raw bytes as the "pixels", which keeps the
# whole operator — sampling, mean threshold, bit packing, dedup grouping —
# oracle-exact in DuckDB (ASCII text: byte == char). 60 bits keeps the
# packed hash a positive BIGINT (the repo-wide hash convention).
#
# Scale shape: hashing is columnar numpy inside Arrow batches (one gather
# matrix per batch, no per-row Python); the only shuffle is the final
# groupBy on the 8-byte hash — identical to exact dedup (d01), because
# after hashing that is exactly what perceptual dedup IS.

_PHASH_BITS = 60
PHASH_SCHEMA = "doc_id long, phash long"


def phash_payloads(
    df: DataFrame, id_col: str = "doc_id", extra_cols: tuple = ()
) -> DataFrame:
    """``extra_cols`` pass through the Arrow batch untouched (e.g. an
    event-time column for the streaming variant below); their types are
    lifted from the input schema."""
    import numpy as np

    extra_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra_cols
    )

    def one_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = codec_available()
        for pdf in batches:
            payloads = pdf["content"].to_numpy()
            n_rows = len(payloads)
            if n_rows == 0:
                # an empty Arrow batch would make `starts` below a 1-long
                # [0] (cumsum of nothing) and desync from the 0-row output
                continue
            if use_real:  # pragma: no cover - codec absent in this container
                for data in payloads:
                    try:
                        decode_image(data)  # real path: grayscale + resize
                    except Exception:  # noqa: BLE001 - undecodable payload
                        pass
            lens = np.fromiter((len(d) for d in payloads), dtype=np.int64, count=n_rows)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # (n, 60) gather of evenly-spaced sample positions per payload
            idx = starts[:, None] + (np.arange(_PHASH_BITS)[None, :] * lens[:, None]) // _PHASH_BITS
            pixels = flat[idx]
            mean = pixels.sum(axis=1).astype(np.float64)[:, None] / _PHASH_BITS
            bits = (pixels > mean).astype(np.int64)
            hashes = bits @ (np.int64(1) << np.arange(_PHASH_BITS, dtype=np.int64))
            out = {"doc_id": pdf[id_col].to_numpy(), "phash": hashes}
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.filter(F.length("content") > 0).select(
        id_col, "content", *extra_cols
    ).mapInPandas(one_batch, schema=PHASH_SCHEMA + extra_schema)


def phash_dedup_stream(docs: DataFrame, ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Streaming perceptual dedup: the SAME Arrow-batched hasher runs
    inside a Structured Streaming micro-batch (mapInPandas is
    streaming-capable), then ``dropDuplicatesWithinWatermark`` keeps the
    first payload seen per phash and — unlike plain dropDuplicates —
    EVICTS each hash from the state store once the watermark passes it,
    so state is bounded by the dedup horizon instead of growing with the
    stream's lifetime. This is the ingest-time image-dedup pattern: hash
    at the edge, dedup within the freshness window, exact-dedup the
    compacted corpus offline (m05) for the long tail."""
    hashed = phash_payloads(docs, extra_cols=(ts_col,))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["phash"])


# Shared oracle CTE: the DuckDB mirror of phash_payloads (single source of
# truth — m05's grouping and m09's banded pairs must verify the SAME hash)
_PHASH_DUCK_CTE = f"""WITH px AS (
  SELECT doc_id, length(text) AS L,
         list_transform(range(0, {_PHASH_BITS}),
             i -> ascii(substr(text, CAST(i * length(text) // {_PHASH_BITS} + 1 AS INT), 1))) AS p
  FROM documents WHERE length(text) > 0
),
hashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {_PHASH_BITS}),
             i -> CASE WHEN p[i + 1] > list_sum(p) / {_PHASH_BITS}.0
                  THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
  FROM px
)"""

_M05_ORACLE = f"""
{_PHASH_DUCK_CTE}
SELECT phash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM hashed
GROUP BY phash
ORDER BY phash
"""


@register("m05_phash_dedup", oracle=_M05_ORACLE)
def m05_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    hashed = phash_payloads(docs)
    return (
        hashed.groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("phash")
    )


# ---- m06: audio feature extraction — framed energy + zero-crossing ---------
# The audio-modality analog of m02: treat the payload as 8-bit PCM, frame
# it (128 samples, no overlap), and emit the two classic cheap features —
# RMS energy and DC-removed zero-crossing count — per frame. Real
# pipelines decode with soundfile/ffmpeg inside the same batch loop (the
# codec gate pattern); the stub reads raw bytes as samples, which keeps
# every number oracle-exact in DuckDB (ASCII corpus: byte == char).
#
# Numeric design (NO rounding anywhere): RMS comes from the exact integer
# sums s = Σx and ss = Σx² via var = ss/n - (s/n)², and the zero-crossing
# sign test is done in scaled integers ((x[i]*n - s) sign == sign of
# x[i] - mean) — so every emitted double is the result of the identical
# IEEE op sequence in both engines. Columnar inside Arrow batches: one
# gather matrix per batch covering all frames of all payloads, no per-row
# Python.

_FRAME_N = 128
AUDIO_SCHEMA = "doc_id long, frame_no int, rms double, zero_crossings int"


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    import numpy as np

    def one_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = codec_available()
        for pdf in batches:
            payloads = pdf["content"].to_numpy()
            n_rows = len(payloads)
            if n_rows == 0:
                continue
            if use_real:  # pragma: no cover - codec absent in this container
                for data in payloads:
                    try:
                        decode_image(data)  # placeholder for audio decode
                    except Exception:  # noqa: BLE001
                        pass
            lens = np.fromiter((len(d) for d in payloads), dtype=np.int64, count=n_rows)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            n_frames = lens // _FRAME_N
            total = int(n_frames.sum())
            if total == 0:
                continue
            f_doc = np.repeat(np.arange(n_rows), n_frames)
            frame_no = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(n_frames)[:-1])), n_frames
            )
            f_start = starts[f_doc] + frame_no * _FRAME_N
            samples = flat[f_start[:, None] + np.arange(_FRAME_N)[None, :]]
            s = samples.sum(axis=1)
            ss = (samples * samples).sum(axis=1)
            var = ss / _FRAME_N - (s / _FRAME_N) * (s / _FRAME_N)
            centered = samples * _FRAME_N - s[:, None]
            zc = (centered[:, 1:] * centered[:, :-1] < 0).sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy()[f_doc],
                    "frame_no": frame_no.astype(np.int32),
                    "rms": np.sqrt(var),
                    "zero_crossings": zc.astype(np.int32),
                }
            )

    return df.filter(F.length("content") >= _FRAME_N).select(id_col, "content").mapInPandas(
        one_batch, schema=AUDIO_SCHEMA
    )


_M06_ORACLE = f"""
WITH framed AS (
  SELECT doc_id, CAST(i AS INT) AS frame_no,
         list_transform(string_split(substr(text, CAST(i * {_FRAME_N} + 1 AS INT), {_FRAME_N}), ''),
                        c -> CAST(ascii(c) AS BIGINT)) AS x
  FROM documents,
       UNNEST(range(0, length(text) // {_FRAME_N})) AS t(i)
  WHERE length(text) >= {_FRAME_N}
),
sums AS (
  SELECT doc_id, frame_no, x,
         list_sum(x) AS s,
         list_sum(list_transform(x, v -> v * v)) AS ss
  FROM framed
)
SELECT doc_id, frame_no,
       sqrt(CAST(ss AS DOUBLE) / {_FRAME_N}
            - (CAST(s AS DOUBLE) / {_FRAME_N}) * (CAST(s AS DOUBLE) / {_FRAME_N})) AS rms,
       CAST(list_sum(list_transform(range(1, {_FRAME_N}),
            i -> CASE WHEN (x[i] * {_FRAME_N} - s) * (x[i + 1] * {_FRAME_N} - s) < 0
                 THEN 1 ELSE 0 END)) AS INT) AS zero_crossings
FROM sums
ORDER BY doc_id, frame_no
"""


@register("m06_audio_energy", oracle=_M06_ORACLE)
def m06_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    return audio_features(docs).orderBy("doc_id", "frame_no")


# ---- m07: video scene-change detection (frame differencing) ----------------
# The video-pipeline staple: sample frames, diff consecutive frames, flag
# cuts where the mean absolute per-pixel change spikes. The stub diffs
# 64-byte "frames" of the raw payload (ffmpeg-decoded luma planes in the
# real container — same loop, same schema). Unlike m02/m05/m06 this one
# needs NO Python at all: frame extraction and the per-byte fold are
# JVM-side higher-order expressions over ascii(substr(...)) — pure
# whole-stage-codegen map work, zero shuffle. All-integer arithmetic
# (sums of abs diffs, one exact division), so the oracle needs no
# rounding.

_M07_FRAME = 64
_M07_CUT = 28.0  # mean-abs-diff threshold (corpus mid-point)

_M07_ORACLE = f"""
WITH pairs AS (
  SELECT doc_id, CAST(i AS INT) AS frame_no,
         list_sum(list_transform(range(0, {_M07_FRAME}),
             j -> abs(ascii(substr(text, CAST(i * {_M07_FRAME} + j + 1 AS INT), 1))
                      - ascii(substr(text, CAST((i + 1) * {_M07_FRAME} + j + 1 AS INT), 1))))) AS sad
  FROM documents,
       UNNEST(range(0, length(text) // {_M07_FRAME} - 1)) AS t(i)
  WHERE length(text) >= {_M07_FRAME} * 2
)
SELECT doc_id, frame_no,
       CAST(sad AS BIGINT) AS sad,
       CAST(sad AS DOUBLE) / {_M07_FRAME} AS mad,
       CAST(CAST(sad AS DOUBLE) / {_M07_FRAME} > {_M07_CUT} AS INT) AS is_cut
FROM pairs
ORDER BY doc_id, frame_no
"""


def scene_changes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Frame-difference columns over a payload-bearing frame; `is_cut`
    flags boundaries where mean absolute change exceeds the threshold."""
    sad = F.expr(
        f"aggregate(sequence(0, {_M07_FRAME} - 1), 0, (acc, j) -> acc + "
        f"abs(ascii(substring({text_col}, i * {_M07_FRAME} + j + 1, 1)) "
        f"- ascii(substring({text_col}, (i + 1) * {_M07_FRAME} + j + 1, 1))))"
    )
    return (
        df.filter(F.length(text_col) >= _M07_FRAME * 2)
        .select(
            "doc_id",
            text_col,
            F.explode(
                F.expr(
                    f"sequence(0, CAST(length({text_col}) / {_M07_FRAME} AS INT) - 2)"
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("frame_no"),
            sad.cast("bigint").alias("sad"),
        )
        .withColumn("mad", F.col("sad").cast("double") / _M07_FRAME)
        .withColumn("is_cut", (F.col("mad") > _M07_CUT).cast("int"))
    )


@register("m07_scene_changes", oracle=_M07_ORACLE)
def m07_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    return scene_changes(docs).orderBy("doc_id", "frame_no")


# ---- m08: caption-image alignment filtering (CLIP-score style) --------------
# The LAION-5B construction filter (arXiv:2210.08402 §2.2): keep an
# image-text pair only when the cosine between the caption's embedding and
# the image's embedding clears a threshold. Here the image tower is the
# stored `embeddings` vector (doc_id = vec_id pairing) and the caption
# tower is a deterministic feature-hashed bag-of-words (the hashing trick,
# Weinberger et al. 2009): token -> dim = md5 % 64, sign = bit 6 of the
# same hash, caption vector = signed token counts. One md5 per token,
# computed map-side once; the 64 dimension sums fold over the cached
# (dim, sign) list, never re-hashing. The alignment is a fold in fixed
# index order of exact-integer x double products, so Spark and DuckDB
# produce bit-identical doubles — no quantization needed.
#
# Scale shape: the caption vector and the cosine are pure map-side
# JVM expressions inside whole-stage codegen; the only exchange is the
# doc_id = vec_id join (sort-merge at 100 TB, both sides pre-bucketable
# by id). In the real container the caption tower is a model served via
# mapInPandas (m02's Arrow pattern); the hashed tower keeps the plumbing
# testable and the plan identical. Reference analog: none (north-star
# multimodal family).

_M08_DIMS = 64
_M08_THRESHOLD = 0.0

_M08_SPARK_H = "CAST(conv(substr(md5(cast(x AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
_M08_DUCK_H = "CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)"

_M08_ORACLE = f"""
WITH cap AS (
  SELECT doc_id,
         list_transform(string_split(trim(text), ' '),
                        x -> struct_pack(
                          d := {_M08_DUCK_H} % {_M08_DIMS},
                          s := CASE WHEN ({_M08_DUCK_H} // {_M08_DIMS}) % 2 = 0
                                    THEN 1 ELSE -1 END)) AS ds
  FROM documents
),
vec AS (
  SELECT doc_id,
         list_transform(range(0, {_M08_DIMS}),
                        j -> CAST(list_sum(list_transform(ds,
                               p -> CASE WHEN p.d = j THEN p.s ELSE 0 END))
                             AS DOUBLE)) AS t
  FROM cap
),
pair AS (
  SELECT v.doc_id, e.label, v.t, e.embedding::DOUBLE[] AS img
  FROM vec v JOIN embeddings e ON v.doc_id = e.vec_id
),
scored AS (
  SELECT doc_id, label,
         list_sum(list_transform(range(1, {_M08_DIMS} + 1), i -> t[i] * img[i]))
           / (sqrt(list_sum(list_transform(t, x -> x * x)))
              * sqrt(list_sum(list_transform(img, x -> x * x)))) AS alignment
  FROM pair
  WHERE list_sum(list_transform(t, x -> x * x)) > 0
)
SELECT doc_id, label, alignment
FROM scored
WHERE alignment >= {_M08_THRESHOLD}
ORDER BY doc_id
"""


@register("m08_caption_alignment", oracle=_M08_ORACLE)
def m08_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("img"),
    )
    ds = F.expr(
        f"transform(split(trim(text), ' '), x -> named_struct("
        f"'d', pmod({_M08_SPARK_H}, {_M08_DIMS}), "
        f"'s', CASE WHEN pmod(({_M08_SPARK_H} div {_M08_DIMS}), 2) = 0 "
        f"THEN 1 ELSE -1 END))"
    )
    t = F.expr(
        f"transform(sequence(0, {_M08_DIMS - 1}), "
        f"j -> CAST(aggregate(ds, 0L, (acc, p) -> "
        f"acc + CASE WHEN p.d = j THEN CAST(p.s AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS DOUBLE))"
    )
    cap = docs.select("doc_id", ds.alias("ds")).select("doc_id", t.alias("t"))
    dot = F.expr(
        f"aggregate(zip_with(t, img, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    nt = F.expr("aggregate(transform(t, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    ni = F.expr("aggregate(transform(img, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    return (
        cap.join(emb, "doc_id")
        .filter(nt > 0)
        .select("doc_id", "label", (dot / (F.sqrt(nt) * F.sqrt(ni))).alias("alignment"))
        .filter(F.col("alignment") >= _M08_THRESHOLD)
        .orderBy("doc_id")
    )


# ---- m09: perceptual-hash Hamming near-dup pairs ----------------------------
# m05 catches EXACT phash collisions (groupBy); real image near-dups
# (re-encodes, slight crops/brightness shifts) land a few bits apart. The
# pigeonhole band trick (d07's move, on payload hashes): split the 60-bit
# phash into 10 bands of 6 bits — any pair within Hamming distance <= 8
# differs in at most 8 bands, so at least one of the 10 bands is IDENTICAL
# and the pair surfaces in that band's bucket join. Candidates are then
# verified with an exact popcount.
#
# Scale shape: hashing is the m05 Arrow path; the only shuffles are the
# band-key self-join (candidates ~ n^2/2^bits per band, never all-pairs)
# and the distinct on surviving pairs. At larger corpora, widen bands /
# raise the band count (guarantee holds while bands > tau) exactly as d07
# prescribes for text simhash.

_M09_TAU = 8  # max Hamming distance reported
_M09_BANDS = 10  # 10 bands x 6 bits; 10 > tau=8 -> pigeonhole-complete
_M09_BAND_BITS = _PHASH_BITS // _M09_BANDS

_M09_ORACLE = f"""
{_PHASH_DUCK_CTE},
bands AS (
  SELECT doc_id, phash, j,
         (phash >> ({_M09_BAND_BITS} * j)) & {2 ** _M09_BAND_BITS - 1} AS band
  FROM hashed, (SELECT unnest(range(0, {_M09_BANDS})) AS j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa, b.doc_id AS doc_b, b.phash AS pb
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= {_M09_TAU}
ORDER BY hamming, doc_a, doc_b
"""


@register("m09_phash_neardup_pairs", oracle=_M09_ORACLE)
def m09_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    hashed = phash_payloads(docs)
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(F.expr(f"sequence(0, {_M09_BANDS - 1})")).alias("j"),
    ).withColumn(
        "band",
        F.expr(f"shiftright(phash, {_M09_BAND_BITS} * j) & {2 ** _M09_BAND_BITS - 1}"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"), "j", "band"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"), "j", "band"
    )
    cand = (
        a.join(b, ["j", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "pa", "doc_b", "pb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(pa ^ pb)").cast("int"))
        .filter(F.col("hamming") <= _M09_TAU)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("hamming", "doc_a", "doc_b")
    )


# ---- m10: corrupt-payload detection ----------------------------------------
# The first validation pass every binary-media pipeline runs at ingest:
# compare each payload's ACTUAL bytes against its DECLARED metadata and
# quarantine disagreements (truncated downloads, bad transcodes, wrong
# content-type) before any decoder touches them — a corrupt sample inside
# a 100 TB training shard otherwise kills the decode stage far from its
# cause. Pure map-side JVM work (length/substring on the binary column —
# no Python, no decode, no shuffle); the output is the driver-sized
# quarantine list. Corruption here is injected deterministically (every
# 13th payload is truncated to half) since the manufactured payloads are
# otherwise always self-consistent; the validation logic — recompute the
# meta formula from the bytes and compare — is exactly the production
# check.
# Reference analog: none (north-star multimodal family).

_M10_MOD = 13

_M10_ORACLE = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(16 + length(text) % 1024 AS INT) AS declared_width,
         CASE WHEN doc_id % {_M10_MOD} = 0
              THEN CAST(floor(length(text) / 2) AS BIGINT)
              ELSE CAST(length(text) AS BIGINT) END AS clen
  FROM documents
)
SELECT doc_id, declared_width,
       CAST(16 + clen % 1024 AS INT) AS actual_width,
       CAST(clen AS INT) AS n_bytes
FROM sized
WHERE declared_width <> 16 + clen % 1024
ORDER BY doc_id
"""


@register("m10_corrupt_detect", oracle=_M10_ORACLE)
def m10_corrupt_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_fake_payloads(read_parquet(spark, f"{sf_dir}/documents.parquet"))
    corrupted = docs.withColumn(
        "content",
        F.when(
            F.col("doc_id") % _M10_MOD == 0,
            F.expr("substring(content, 1, CAST(floor(length(content) / 2) AS INT))"),
        ).otherwise(F.col("content")),
    )
    declared = F.col("meta.width").alias("declared_width")
    actual = (16 + F.length("content") % 1024).cast("int")
    return (
        corrupted.select(
            "doc_id",
            declared,
            actual.alias("actual_width"),
            F.length("content").cast("int").alias("n_bytes"),
        )
        .filter(F.col("declared_width") != F.col("actual_width"))
        .orderBy("doc_id")
    )


# ---- m11: video near-dup via sampled-frame pHash voting --------------------
# The video twin of m09: two videos are near-duplicates when ENOUGH of
# their sampled frames perceptually match at the same temporal position —
# re-encodes and container changes alter bytes but not frame content, so
# frame-level pHash voting is the standard first-pass video dedup (same
# composition YouTube-scale dedup papers describe: sample -> perceptual
# hash -> vote). Composes the m03 frame sampler with the m05/m09 Arrow
# pHash stage end to end.
#
# Scale shape: frame sampling and hashing are map-side (posexplode +
# mapInPandas Arrow batches, bounded _MAX_FRAMES rows per video); the
# only shuffle is the (frame_no, phash) self-join — temporal alignment
# keeps buckets to same-position frames, and the vote threshold bounds
# output by real overlap, never all-pairs. The hashed-frame relation is
# computed once and kept cached for both join sides (the d03 move).
# Reference analog: none (north-star multimodal family).

_M11_MIN_FRAMES = 2

_M11_ORACLE = f"""
WITH framed AS (
  SELECT doc_id, CAST(i AS INT) AS frame_no,
         substr(text, CAST(i * {_FRAME_BYTES} + 1 AS INT), {_FRAME_BYTES}) AS fb
  FROM documents,
       UNNEST(range(0, greatest(least(length(text) // {_FRAME_BYTES}, {_MAX_FRAMES}), 0))) AS t(i)
),
px AS (
  SELECT doc_id, frame_no,
         list_transform(range(0, {_PHASH_BITS}),
             j -> ascii(substr(fb, CAST(j * length(fb) // {_PHASH_BITS} + 1 AS INT), 1))) AS p
  FROM framed WHERE length(fb) > 0
),
fp AS (
  SELECT doc_id, frame_no,
         CAST(list_sum(list_transform(range(0, {_PHASH_BITS}),
             j -> CASE WHEN p[j + 1] > list_sum(p) / {_PHASH_BITS}.0
                  THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
  FROM px
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_frames_matched
FROM fp a JOIN fp b
  ON a.frame_no = b.frame_no AND a.phash = b.phash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_M11_MIN_FRAMES}
ORDER BY doc_a, doc_b
"""


@register("m11_video_neardup", oracle=_M11_ORACLE)
def m11_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.caching import keep_cached

    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    n_frames = F.expr(
        f"greatest(least(CAST(length(content) / {_FRAME_BYTES} AS INT), {_MAX_FRAMES}), 0)"
    )
    frames_arr = F.when(
        n_frames > 0,
        F.expr(
            f"transform(sequence(0, greatest(least(CAST(length(content) / {_FRAME_BYTES} AS INT), {_MAX_FRAMES}), 1) - 1), "
            f"i -> substring(content, i * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))"
        ),
    ).otherwise(F.expr("array()"))
    frames = docs.select(
        "doc_id", F.posexplode(frames_arr).alias("frame_no", "content")
    )
    fp = keep_cached(phash_payloads(frames, extra_cols=("frame_no",)))
    a = fp.select(F.col("doc_id").alias("doc_a"), "frame_no", "phash")
    b = fp.select(F.col("doc_id").alias("doc_b"), "frame_no", "phash")
    return (
        a.join(b, ["frame_no", "phash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= _M11_MIN_FRAMES)
        .orderBy("doc_a", "doc_b")
    )


# ---- m12: perceptual-hash duplicate clusters --------------------------------
# m09 emits near-dup PAIRS; a curation pass needs CLUSTERS — "this image
# exists in 7 variants, keep one". Connected components over the m09 edge
# set (Hamming <= tau, pigeonhole-complete banding), reported per cluster:
# representative id (min doc_id), member count. Same CC engine as the
# text dedup family (min-label propagation with a monotone convergence
# witness and a hard non-convergence error); the edge relation is bounded
# by real near-duplication, never all-pairs. Only multi-image clusters
# are reported — the keep-list is `all images - (members - reps)`.

_M12_ORACLE = f"""
WITH RECURSIVE
{_PHASH_DUCK_CTE.removeprefix("WITH ")},
bands AS (
  SELECT doc_id, phash, j,
         (phash >> ({_M09_BAND_BITS} * j)) & {2 ** _M09_BAND_BITS - 1} AS band
  FROM hashed, (SELECT unnest(range(0, {_M09_BANDS})) AS j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {_M09_TAU}
),
edges2 AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM hashed
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges2 e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
)
SELECT component AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_images
FROM comp
GROUP BY component
HAVING COUNT(*) >= 2
ORDER BY n_images DESC, cluster_id
"""


@register("m12_phash_components", oracle=_M12_ORACLE)
def m12_phash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_osmosis_spark.operators.caching import keep_cached
    from dbt_osmosis_spark.operators.pipeline import connected_components

    docs = attach_fake_payloads(spread(read_parquet(spark, f"{sf_dir}/documents.parquet")))
    hashed = phash_payloads(docs)
    # Quotient contraction: identical phashes are Hamming-0 edges, so
    # collapsing them FIRST (one exact groupBy — the m05 shape) is an
    # exact graph contraction. Banding, the pair join, and the CC rounds
    # then run over DISTINCT hashes (node id = the group's min doc_id, so
    # cluster_id semantics are unchanged); cluster sizes re-expand from
    # the carried member counts. Same clusters, strictly less work — and
    # the contraction is also the scale story: the join input is the
    # distinct-hash relation, not the image corpus.
    groups = (
        hashed.groupBy("phash")
        .agg(F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("n_docs"))
        .transform(keep_cached)
    )
    bands = groups.select(
        "rep",
        "phash",
        F.explode(F.expr(f"sequence(0, {_M09_BANDS - 1})")).alias("j"),
    ).withColumn(
        "band",
        F.expr(f"shiftright(phash, {_M09_BAND_BITS} * j) & {2 ** _M09_BAND_BITS - 1}"),
    )
    a = bands.select(F.col("rep").alias("rep_a"), F.col("phash").alias("pa"), "j", "band")
    b = bands.select(F.col("rep").alias("rep_b"), F.col("phash").alias("pb"), "j", "band")
    edges = (
        a.join(b, ["j", "band"])
        .filter(F.col("rep_a") < F.col("rep_b"))
        .filter(F.expr(f"bit_count(pa ^ pb) <= {_M09_TAU}"))
        .select(F.col("rep_a").alias("src"), F.col("rep_b").alias("dst"))
        .distinct()
    )
    comp = connected_components(groups.select(F.col("rep").alias("id")), edges)
    return (
        comp.join(groups.select(F.col("rep").alias("id"), "n_docs"), "id")
        .groupBy(F.col("component").alias("cluster_id"))
        .agg(F.sum("n_docs").cast("bigint").alias("n_images"))
        .filter(F.col("n_images") >= 2)
        .orderBy(F.desc("n_images"), "cluster_id")
    )
