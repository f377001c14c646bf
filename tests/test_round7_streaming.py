"""Continuous Count-Min sketch maintenance (streaming/sketch.py): the
mergeable-summary twin of t22, with its exactly-once-by-idempotent-
overwrite contract exercised."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_osmosis_spark.sources.parquet import read_parquet
from dbt_osmosis_spark.streaming.sketch import (
    batch_cell_counts,
    estimate_counts,
    read_sketch,
    run_sketch_ingest,
    write_batch_cells,
)


def _cells(df) -> dict:
    return {(r.i, r.bucket): r.cnt for r in df.collect()}


def _split_corpus(spark, sf_dir, incoming, tmp_path, n_files=3):
    import glob
    import os
    import shutil

    os.makedirs(incoming, exist_ok=True)
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    for k in range(n_files):
        stage = str(tmp_path / f"stage{k}")
        docs.filter(F.col("doc_id") % n_files == k).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{incoming}/batch{k}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))
    return docs


def test_streamed_sketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Cell-wise sum of per-batch sketches == the one-shot batch sketch
    (the CMS merge property, end-to-end through the streaming loop)."""
    incoming = str(tmp_path / "incoming")
    sketch_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    docs = _split_corpus(spark, sf_dir, incoming, tmp_path)

    run_sketch_ingest(incoming, sketch_dir, ckpt, spark)

    streamed = _cells(read_sketch(spark, sketch_dir))
    batch = _cells(batch_cell_counts(docs))
    assert streamed == batch

    # the stream really ran as multiple micro-batches
    batches = {
        r.batch for r in spark.read.parquet(sketch_dir).select("batch").distinct().collect()
    }
    assert len(batches) >= 3


def test_streamed_estimates_match_t22(spark, sf_dir, tmp_path):
    """Heavy-hitter estimates served off the streamed sketch equal the
    registered batch operator's estimates for the same top-k words."""
    from dbt_osmosis_spark.operators import QUERIES, load_all

    load_all()
    incoming = str(tmp_path / "incoming")
    sketch_dir = str(tmp_path / "sketch")
    _split_corpus(spark, sf_dir, incoming, tmp_path)
    run_sketch_ingest(incoming, sketch_dir, str(tmp_path / "ckpt"), spark)
    t22 = {r.word: r.est_n for r in QUERIES["t22_countmin_eval"](spark, sf_dir).collect()}
    words = spark.createDataFrame([(w,) for w in t22], "word string")
    est = {
        r.word: r.est_n
        for r in estimate_counts(read_sketch(spark, sketch_dir), words).collect()
    }
    assert est == t22


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once; a replayed batch must overwrite its
    own partition with identical cells, leaving totals unchanged."""
    sketch_dir = str(tmp_path / "sketch")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    write_batch_cells(b0, sketch_dir, 0)
    write_batch_cells(b1, sketch_dir, 1)
    before = _cells(read_sketch(spark, sketch_dir))
    write_batch_cells(b1, sketch_dir, 1)  # replay
    after = _cells(read_sketch(spark, sketch_dir))
    assert after == before
    assert before == _cells(batch_cell_counts(docs))


def _batch_funnel_stages(spark, events_path):
    from dbt_osmosis_spark.sources.parquet import read_parquet

    e = read_parquet(spark, events_path)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    want = set()
    for df, step, col in ((v, "1_view", "t1"), (c, "2_click", "t2"), (p, "3_purchase", "t3")):
        want |= {(r.user_id, step, r[col]) for r in df.collect()}
    return want


def test_funnel_stream_single_batch_matches_q73_stages(spark, sf_dir):
    """Full-backlog drain: the stream's exactly-once step emissions equal
    the batch funnel's per-user stage timestamps."""
    from dbt_osmosis_spark.streaming.events import (
        funnel_stream,
        run_to_memory,
        stream_events,
    )

    out = funnel_stream(stream_events(spark, sf_dir))
    run_to_memory(out, "funnel_stream_1", output_mode="update")
    got = {
        (r.user_id, r.step, r.ts)
        for r in spark.sql("SELECT * FROM funnel_stream_1").collect()
    }
    assert got == _batch_funnel_stages(spark, f"{sf_dir}/events.parquet")


def test_funnel_stream_time_ordered_batches_match_q73(spark, sf_dir, tmp_path):
    """Cross-batch state: events split into three chronological files,
    streamed one file per trigger — the per-user step machine carries
    (t1, t2, t3) across batches and still lands exactly on the batch
    answer (the documented time-ordered-delivery contract)."""
    import glob
    import os
    import shutil

    from dbt_osmosis_spark.sources.parquet import read_parquet
    from dbt_osmosis_spark.streaming.events import funnel_stream, run_to_memory

    e = read_parquet(spark, f"{sf_dir}/events.parquet")
    ts_cuts = e.selectExpr(
        "timestamp_seconds(percentile(CAST(ts AS DOUBLE), 0.33)) AS a",
        "timestamp_seconds(percentile(CAST(ts AS DOUBLE), 0.66)) AS b",
    ).collect()[0]
    parts = [
        e.filter(F.col("ts") <= ts_cuts.a),
        e.filter((F.col("ts") > ts_cuts.a) & (F.col("ts") <= ts_cuts.b)),
        e.filter(F.col("ts") > ts_cuts.b),
    ]
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    for i, part in enumerate(parts):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(stage)
        src = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{incoming}/batch{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    out = funnel_stream(stream)
    run_to_memory(out, "funnel_stream_3", output_mode="update")
    got = {
        (r.user_id, r.step, r.ts)
        for r in spark.sql("SELECT * FROM funnel_stream_3").collect()
    }
    assert got == _batch_funnel_stages(spark, f"{sf_dir}/events.parquet")
    # exactly-once: no step emitted twice for a user
    n = spark.sql("SELECT COUNT(*) AS n FROM funnel_stream_3").collect()[0].n
    assert n == len(got)


# ---- continuous histogram/quantile maintenance -------------------------------


def _split_events(spark, sf_dir, incoming, tmp_path, n_files=3):
    import glob
    import os
    import shutil

    from dbt_osmosis_spark.sources.parquet import read_parquet

    os.makedirs(incoming, exist_ok=True)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    for k in range(n_files):
        stage = str(tmp_path / f"estage{k}")
        ev.filter(F.col("event_id") % n_files == k).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{incoming}/ebatch{k}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000 + k, 1_000_000 + k))
    return ev


def test_streamed_histogram_equals_batch_and_serves_quantiles(spark, sf_dir, tmp_path):
    """Cell-wise merge of per-batch histograms == the one-shot batch
    histogram, and percentile estimates served from the streamed state
    equal estimates computed directly on the full batch cells."""
    from dbt_osmosis_spark.streaming.histogram import (
        batch_histogram_cells,
        estimate_percentiles,
        read_histogram,
        run_histogram_ingest,
        write_batch_cells,
    )

    incoming = str(tmp_path / "eincoming")
    hist_dir = str(tmp_path / "hist")
    ev = _split_events(spark, sf_dir, incoming, tmp_path)
    run_histogram_ingest(incoming, hist_dir, str(tmp_path / "eckpt"), spark)

    streamed = {(r.event_type, r.bin): r.cnt for r in read_histogram(spark, hist_dir).collect()}
    batch = {(r.event_type, r.bin): r.cnt for r in batch_histogram_cells(ev).collect()}
    assert streamed == batch

    est_stream = {
        (r.event_type, r.pct): r.est_v
        for r in estimate_percentiles(read_histogram(spark, hist_dir)).collect()
    }
    est_batch = {
        (r.event_type, r.pct): r.est_v
        for r in estimate_percentiles(batch_histogram_cells(ev)).collect()
    }
    assert est_stream == est_batch
    assert len(est_stream) == 5 * 3  # 5 types x 3 percentiles

    # replay idempotence (the exactly-once contract)
    before = dict(streamed)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    write_batch_cells(b0, hist_dir, 0)
    after = {(r.event_type, r.bin): r.cnt for r in read_histogram(spark, hist_dir).collect()}
    assert after == before
