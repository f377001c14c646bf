"""Physical-plan property assertions — the engine's scale claims, tested.

Each assertion here is a 100 TB design requirement phrased as a plan
property: if a refactor silently turns a broadcast join into a shuffle join
or breaks parquet filter pushdown, these tests fail even though results
stay correct.
"""

from __future__ import annotations

import pytest

from dbt_osmosis_spark.operators import QUERIES, load_all
from dbt_osmosis_spark.plans.audit import (
    exchange_count,
    has_broadcast_join,
    has_cartesian,
    physical_plan,
    pushed_filters,
    scan_schemas,
    uses_top_k,
    whole_stage_codegen_spans,
)

load_all()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name):
        return QUERIES[name](spark, sf_dir)

    return build


def test_q01_filter_pushdown_and_pruning(q):
    df = q("q01_pricing_summary")
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), f"shipdate not pushed: {pushed}"
    schemas = scan_schemas(df)
    # 7 needed columns, not all 11 — column pruning reached the scan
    assert schemas and all("l_partkey" not in s and "l_suppkey" not in s for s in schemas)


def test_q04_broadcasts_dimensions(q):
    df = q("q04_revenue_by_nation")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)


def test_q05_top_k_not_global_sort(q):
    assert uses_top_k(q("q05_top_customers"))


def test_q03_no_cartesian_in_join_chain(q):
    df = q("q03_customer_ltv")
    assert not has_cartesian(df)


def test_s01_broadcast_scalar_query_vector(q):
    # the 1-row query vector must broadcast; the corpus scan stays map-side
    df = q("s01_cosine_topk")
    assert has_broadcast_join(df)
    assert uses_top_k(df)


def test_d01_single_shuffle_dedup(q):
    # exact dedup = groupBy(hash): one shuffle for the agg (+1 for the
    # deterministic output sort) and nothing else
    df = q("d01_dedup_exact")
    assert exchange_count(df) <= 2


def test_codegen_spans_exist(q):
    # whole-stage codegen fuses the hot path; zero spans would mean the
    # plan fell out of codegen entirely (e.g. an accidental python UDF).
    # AQE annotates codegen regions only in the executed final plan.
    df = q("q01_pricing_summary")
    df.collect()
    assert whole_stage_codegen_spans(df) >= 1


def test_m01_metadata_query_prunes_payload(q):
    # metadata-only multimodal query must not carry payload bytes through
    # the final projection—the content column exists only to derive meta
    df = q("m01_image_meta")
    assert "content" not in df.columns


def test_p04_broadcasts_eval_shingles(q):
    """Decontamination must broadcast the (small) eval shingle set — the
    train side joins without a shuffle of its exploded shingles."""
    assert has_broadcast_join(q("p04_decontaminate"))


def test_t06_vocab_topk_not_global_sort(q):
    assert uses_top_k(q("t06_vocab_topk"))


def test_p01_hash_sample_prunes_text(q):
    """The sample projects metadata only — the wide text column must not be
    read from parquet."""
    assert all("text" not in s for s in scan_schemas(q("p01_hash_sample")))


def test_q33_unpivot_is_expand_not_join(q):
    """unpivot must lower to an Expand (k rows emitted in-place per input
    row) — one shuffle for the aggregate, none added by the melt, and no
    self-join/union re-scan of the wide relation."""
    from dbt_osmosis_spark.plans.audit import physical_plan

    df = q("q33_unpivot")
    plan = physical_plan(df)
    assert "Expand" in plan
    # one exchange for the groupBy, one for the final orderBy range partition
    assert exchange_count(df) <= 2


def test_s03_centroids_partial_agg_no_collect_list(q):
    """The registered centroid query must be the scale-safe plan: a plain
    hash aggregate over a single accumulator per (label, pos) — no
    collect_list materialization (which is per-group state proportional to
    corpus size) and at most the agg shuffle + presentation sort."""
    from dbt_osmosis_spark.plans.audit import physical_plan

    df = q("s03_label_centroids")
    plan = physical_plan(df)
    assert "collect_list" not in plan
    assert "ObjectHashAggregate" not in plan  # collect_list forces this mode
    assert "HashAggregate" in plan  # partial + final hash agg, codegen-able
    assert exchange_count(df) <= 2


def test_p08_weighted_sample_is_top_k(q):
    # E-S selection must plan as TakeOrderedAndProject (per-partition heap
    # + small merge), not a global sort of the corpus
    assert uses_top_k(q("p08_weighted_sample"))


def test_p10_passage_dedup_shuffles_bounded(q):
    """Passage dedup's real shuffles are the md5-window and the doc_id
    reassembly; everything else is map-side or presentation (the final
    orderBy + the small-file spread repartition)."""
    df = q("p10_passage_dedup")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "md5" in plan  # dedup key is hashed — uniform shuffle distribution
    assert exchange_count(df) <= 5


def test_s06_s07_are_map_side(q):
    """Quantization and random projection must stay map-side: no joins, no
    aggregates; the only exchanges are the spread repartition and the
    presentation sort."""
    for name in ("s06_int8_quantize", "s07_random_projection"):
        df = q(name)
        plan = physical_plan(df)
        assert "Join" not in plan, name
        assert "Aggregate" not in plan.replace("aggregate(", ""), name
        assert exchange_count(df) <= 2, name


def test_p12_broadcasts_bloom_bits(q):
    """Bloom decontamination ships only the bit set (<= 2^14 rows) — both
    small sides (bloom bits, eval shingles) must be broadcast; the train
    shingle stream joins without shuffling itself by value."""
    assert has_broadcast_join(q("p12_bloom_decontaminate"))


def test_p15_assignment_is_map_side(q):
    """The Lloyd step has exactly one aggregation shuffle (on the cell
    key): assignment to centroids is a pure map-side expression — at 100 TB
    there is no join and no second exchange before the partial agg."""
    # final orderBy adds a range exchange; the agg itself contributes one.
    assert exchange_count(q("p15_kmeans_lloyd")) <= 2
    assert not has_cartesian(q("p15_kmeans_lloyd"))


def test_q41_moments_single_shuffle(q):
    """Exact moment statistics are five partial aggregates — one shuffle on
    the group key, identical plan shape to a plain groupBy-sum."""
    assert exchange_count(q("q41_stats_aggregates")) <= 2


def test_q44_distinct_then_broadcast(q):
    """Fuzzy value matching dedupes to the tiny distinct domain FIRST, then
    broadcasts it — the quadratic comparison never touches fact rows."""
    assert has_broadcast_join(q("q44_edit_distance"))
    assert not has_cartesian(q("q44_edit_distance"))


def test_s08_pq_broadcasts_lut_and_topk(q):
    # the 8x16 ADC lookup table is a 1-row broadcast; the code scan merges
    # via per-partition top-k, never a global sort
    df = q("s08_pq_adc_topk")
    assert has_broadcast_join(df)
    assert uses_top_k(df)


def test_m05_phash_single_shuffle(q):
    # perceptual dedup after hashing IS exact dedup: one shuffle for the
    # hash groupBy (+1 for the presentation sort), hashing itself map-side
    df = q("m05_phash_dedup")
    assert exchange_count(df) <= 2


def test_t11_t12_are_map_side(q):
    # per-doc text scoring must not shuffle anything except its
    # presentation orderBy (range partitioning for the sort)
    for name in ("t11_char_entropy", "t12_gopher_rules"):
        assert exchange_count(q(name)) <= 1, name


def test_p17_single_agg_shuffle(q):
    # dataset-card rollup: partial agg map-side, one shuffle on the
    # low-cardinality (source, lang) key; countDistinct adds its expand
    # stage but no extra wide exchange beyond the two-stage distinct
    df = q("p17_corpus_report")
    assert exchange_count(df) <= 3


def test_p19_no_corpus_wide_single_partition(q):
    # the global enumeration must not plan a corpus-wide single-partition
    # sort: the only SinglePartition exchange allowed is the tiny
    # bucket-offset window (input = groupBy(lang) counts)
    df = q("p19_global_order")
    plan = physical_plan(df)
    assert plan.count("Exchange SinglePartition") <= 1


def test_m07_map_side_no_join(q):
    # frame differencing is per-doc map work: the plan must contain no
    # join and no shuffle beyond the presentation sort
    df = q("m07_scene_changes")
    plan = physical_plan(df)
    assert "Join" not in plan
    assert exchange_count(df) <= 1


def test_d13_semantic_dedup_clustered_not_allpairs(q):
    # SemDeDup's whole point: the pair join is keyed on the cluster cell
    # (SortMergeJoin/ShuffledHashJoin on cell equality), never a cartesian
    # all-pairs product — that is what keeps the verify sub-quadratic when
    # the cluster count scales with the corpus
    df = q("d13_semantic_dedup")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "Join" in plan


def test_s11_hamming_broadcast_topk(q):
    # 1-bit codes: packing is map-side, the 1-row query signature
    # broadcasts, and ranking is per-partition top-k (TakeOrderedAndProject)
    # — the same scan shape as s01 at 1/32 the bytes
    df = q("s11_hamming_topk")
    assert has_broadcast_join(df)
    assert uses_top_k(df)


def test_p24_dsir_model_broadcasts_and_topk(q):
    # the hashed-bucket model is bounded at B rows regardless of vocab, so
    # it must broadcast to the scoring join; selection is per-partition
    # top-N (TakeOrderedAndProject), never a global sort of the pool
    df = q("p24_dsir_select")
    assert has_broadcast_join(df)
    assert uses_top_k(df)


def test_s12_recall_eval_broadcasts_exact_set(q):
    # the k-row exact top-k must broadcast to the union of ANN shortlists;
    # the eval never reshuffles the corpus (all scans live in the four
    # composed ANN sub-plans)
    df = q("s12_ann_recall")
    assert has_broadcast_join(df)


def test_s13_int8_rerank_two_stage(q):
    # int8 two-stage retrieval: the 1-row query codes broadcast, stage 1
    # ranks by pure-integer dot via per-partition top-C
    # (TakeOrderedAndProject — never a global sort), and the exact cosine
    # touches only the C-row shortlist
    df = q("s13_int8_rerank_topk")
    assert has_broadcast_join(df)
    assert uses_top_k(df)
    assert not has_cartesian(df)


def test_p25_temperature_mix_docs_never_shuffle(q):
    # the per-source rate table is the ONLY thing that aggregates; docs
    # take the broadcast-join + filter path — no exchange keyed on doc rows
    df = q("p25_temperature_mix")
    assert has_broadcast_join(df)


def test_t15_novelty_single_key_shuffle(q):
    # first-seen index shuffles on the 8-byte bigram hash, not the bigram
    # string; no cartesian, no broadcast of the (corpus-sized) bigram set
    df = q("t15_bigram_novelty")
    assert not has_cartesian(df)


def test_d15_span_coverage_hash_shuffle_only(q):
    # windows shuffle as 8-byte md5 hashes (never the k-token strings past
    # the map stage); no cartesian anywhere in the coverage computation
    df = q("d15_repeated_span_coverage")
    assert not has_cartesian(df)


def test_m08_alignment_mapside_towers(q):
    # caption tower + cosine are map-side expressions; the only exchange
    # is the doc_id = vec_id pair join — no cartesian, no global sort of
    # the corpus
    df = q("m08_caption_alignment")
    assert not has_cartesian(df)


def test_d16_winnowing_fingerprint_join_only(q):
    # fingerprint selection is higher-order-function map work; the only
    # join is the fingerprint-key self-join — no cartesian, and the top
    # pair ranking is TakeOrderedAndProject, not a global sort
    df = q("d16_winnowing_pairs")
    assert not has_cartesian(df)
    assert uses_top_k(df)


def test_p27_budget_select_no_global_doc_sort(q):
    # per-bin totals broadcast back; the docs-side window partitions by
    # score_bin (parallel) — the plan must not contain a global (empty-
    # partition-spec) window over the document relation, and the tiny bin
    # relation joins back via broadcast
    from dbt_osmosis_spark.plans.audit import physical_plan

    df = q("p27_token_budget_select")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    # only tiny relations collapse to one partition: the <= 10001-row
    # bin-cumsum window and the 1-row budget aggregate; the doc-side
    # running-total window must hash-partition on score_bin, never
    # collapse the corpus
    assert plan.count("Exchange SinglePartition") <= 2
    assert "Exchange hashpartitioning(score_bin" in plan
    assert not has_cartesian(df)


def test_m09_phash_bands_no_cartesian(q):
    # band-key equi-join + distinct + popcount verify — never all-pairs
    df = q("m09_phash_neardup_pairs")
    assert not has_cartesian(df)


def test_s14_mmr_shortlist_is_topk(q):
    # stage 1 must plan as TakeOrderedAndProject (per-partition heap over
    # the corpus scan); stage 2's greedy sees only the constant-C rows
    df = q("s14_mmr_rerank")
    assert uses_top_k(df)
    assert not has_cartesian(df)


def test_s15_batched_lsh_plan_shape(q):
    """Batched ANN serving: probe rows broadcast against the bucketed
    corpus (zero corpus-side shuffle before the join), per-query top-k via
    a qid-partitioned window — the only hash exchange is on qid."""
    df = q("s15_batched_lsh_topk")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    # the window must partition by qid, never collapse to one partition;
    # the only single-partition collapses allowed are the 1-row adaptive
    # key-width (xbits) aggregates — replayed once per join side, but each
    # is a metadata-only COUNT(*) (ReadSchema: struct<>), never a data scan
    assert "hashpartitioning(qid" in plan
    assert plan.count("Exchange SinglePartition") <= 2
    assert "ReadSchema: struct<>" in plan


def test_p29_single_scan_single_aggregate(q):
    """Filter agreement must cost ONE corpus scan and one global aggregate
    (partial -> 1 row), however many filters participate: no joins, no
    per-filter passes — the only exchange is the final single-partition
    aggregate over the 32 partial rows."""
    df = q("p29_filter_agreement")
    assert exchange_count(df) == 1
    assert not has_cartesian(df)
    assert len(scan_schemas(df)) == 1


def test_s16_broadcasts_centroid_model(q):
    """The 20-row centroid model must broadcast to the distance pass; the
    corpus never shuffles for the join (only the posexplode aggregate and
    the per-label rank window exchange)."""
    df = q("s16_centroid_outliers")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    assert "hashpartitioning(label" in physical_plan(df)


def test_s17_serve_scan_prunes_to_probed_cells(q):
    """The registered build/serve query must read back ONLY the probed
    cell partitions: the batch's cell IN-list is a PartitionFilter at the
    index FileScan (static pruning — the scan never lists unprobed
    cells), the 8-row query relation broadcasts, and per-query top-k is a
    qid window, not a global sort."""
    df = q("s17_ivf_index_serve")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any(
        "PartitionFilters" in ln and "cell" in ln.split("PartitionFilters", 1)[1][:160]
        for ln in scan_lines
    ), scan_lines
    assert "hashpartitioning(qid" in plan


def test_d17_eval_side_broadcasts(q):
    """Fuzzy decontamination: the benchmark side (bands AND signatures)
    must broadcast — the corpus side never shuffles for the candidate
    join. The only hash exchanges are the distinct over candidates and
    the per-doc verdict window."""
    df = q("d17_fuzzy_decontamination")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(doc_id" in plan


def test_t17_single_corpus_scan(q):
    """OOV rate: the corpus text is scanned once — vocabulary and the
    per-source rollup both derive from the cached (source, word) partial
    aggregate, and the vocab joins back via broadcast."""
    df = q("t17_oov_rate")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    assert len(scan_schemas(df)) <= 1  # 0 once the cached frame serves both


def test_m10_mapside_validation(q):
    """Corrupt-payload detection is map-side: no joins, no aggregates —
    the only exchange is the presentation-order sort of the quarantine
    list."""
    df = q("m10_corrupt_detect")
    assert not has_cartesian(df)
    assert exchange_count(df) <= 1


def test_q53_funnel_single_join_key(q):
    """The funnel chains three groupBys on ONE key (user_id) — no
    cartesian anywhere, and every hash exchange in the plan is on
    user_id (the rollup itself is a 3-row union, SinglePartition)."""
    df = q("q53_event_funnel")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    import re

    keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert keys <= {"user_id"}, keys


def test_p30_single_rank_window_over_shared_cc(q):
    """Quality-keep reuses the shared CC chain; the representative choice
    is ONE window over component (plus the broadcast-join-backed quality
    features) — no cartesian, no global sort of the corpus."""
    df = q("p30_quality_keep")
    assert not has_cartesian(df)
    assert "hashpartitioning(component" in physical_plan(df)


def test_m11_frame_join_is_bounded(q):
    """Video near-dup: the only join is the (frame_no, phash) self-join —
    temporal alignment in the key, no cartesian; the hashed-frame
    relation is cached so the Arrow hashing runs once."""
    df = q("m11_video_neardup")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    # at driver SFs the cached frame relation broadcasts (even better);
    # at scale the join shuffles on the aligned (frame_no, phash) key
    assert "hashpartitioning(frame_no" in plan or has_broadcast_join(df)


def test_s18_serve_scan_prunes_to_probed_buckets(q):
    """The LSH index serve must read back ONLY the probed bucket
    partitions (the batch's bucket IN-list is a PartitionFilter at the
    index FileScan), the query relation broadcasts, and per-query top-k
    is a qid window, not a global sort."""
    df = q("s18_lsh_index_serve")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any(
        "PartitionFilters" in ln and "bucket" in ln.split("PartitionFilters", 1)[1][:160]
        for ln in scan_lines
    ), scan_lines
    assert "hashpartitioning(qid" in plan


def test_s19_filtered_ann_shape(q):
    """Filtered ANN: the 8-row query relation (with probe lists and the
    label predicate) broadcasts against the cell-assigned corpus — the
    corpus never shuffles for the candidate join; the only exchange is
    the per-qid rank window."""
    df = q("s19_filtered_ann")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(qid" in plan
    assert exchange_count(df) <= 3


def test_q55_sweep_line_is_binned(q):
    """The concurrency sweep must NOT be a single global running sum: the
    per-boundary window partitions on the hour bin (parallel), the
    carry-in offsets join back via broadcast, and the only
    single-partition window runs over the |bins|-row net frame."""
    df = q("q55_concurrent_intervals")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(bin" in plan


def test_q56_no_single_partition_anywhere(q):
    """Cumulative-distinct accrual runs entirely on user-partitioned
    windows and aggregates — no SinglePartition exchange may appear (the
    terminal sort is a range partitioning over oracle-sized output)."""
    df = q("q56_distinct_accrual")
    plan = physical_plan(df)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_s20_incremental_serve_scan_prunes(q):
    """The incrementally-built index must serve exactly like s17's:
    probed-cell PartitionFilters at the scan, broadcast query relation,
    qid-window top-k."""
    df = q("s20_ivf_incremental_serve")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any(
        "PartitionFilters" in ln and "cell" in ln.split("PartitionFilters", 1)[1][:160]
        for ln in scan_lines
    ), scan_lines
    assert "hashpartitioning(qid" in plan


def test_p32_merge_never_single_partitions(q):
    """Partial-state merge must stay key-partitioned end to end: no
    SinglePartition exchange anywhere (the report is per-source)."""
    df = q("p32_incremental_stats")
    plan = physical_plan(df)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan


def test_p33_one_counts_shuffle_then_broadcasts(q):
    """The only data-sized shuffle is the (event_type, user_id) counts
    aggregate; per-type rollup and hot-key identification join back via
    broadcast."""
    df = q("p33_skew_report")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(event_type" in plan


def test_p34_salted_window_precedes_final(q):
    """Two-phase top-k: the heavy ranking runs in (lang, salt) partitions
    (parallelism |langs| x 32); the lang-only window exists but only ever
    sees the <= |langs| x 32 x k candidate survivors."""
    df = q("p34_salted_topk")
    plan = physical_plan(df)
    assert "hashpartitioning(lang" in plan and "salt" in plan
    assert "SinglePartition" not in plan


def test_s21_sweep_broadcasts_query_side(q):
    """The probe sweep's corpus joins are both broadcast (configs and the
    truth query batch); ranking partitions on (np, qid) / qid."""
    df = q("s21_ivf_probe_sweep")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    assert "hashpartitioning(np" in plan and "hashpartitioning(qid" in plan


def test_q57_retention_runs_on_user_scale_keys(q):
    """The cohort matrix never re-touches raw events after the (user,
    week) distinct: every exchange keys on user_id or the dimension-sized
    cohort cell — no SinglePartition, no broadcast needed, no cartesian."""
    df = q("q57_retention_cohorts")
    plan = physical_plan(df)
    assert "SinglePartition" not in plan
    assert not has_cartesian(df)
    assert "hashpartitioning(user_id" in plan
    assert "hashpartitioning(cohort_week" in plan


def test_q58_gap_fill_grid_is_broadcast(q):
    """The dense (type, hour) grid is dimension-sized and joins the
    observed aggregate via broadcast; the only corpus-scale exchange is
    the partial-agg'd (event_type, hour) counts shuffle."""
    df = q("q58_gap_fill")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    assert "hashpartitioning(event_type" in plan
    assert exchange_count(df) <= 4


def test_d18_paragraph_dedup_two_corpus_shuffles(q):
    """Paragraph dedup is exactly two corpus-scale shuffles — the
    first-occurrence window on the 64-bit block hash and the doc_id
    reassembly aggregate — plus the terminal presentation sort. No
    pair-blowup join exists anywhere in the plan."""
    df = q("d18_paragraph_dedup")
    plan = physical_plan(df)
    assert "hashpartitioning(h" in plan
    assert "hashpartitioning(doc_id" in plan
    assert "SinglePartition" not in plan
    assert not has_cartesian(df)
    assert exchange_count(df) <= 3


def test_t19_trigram_model_broadcasts(q):
    """Trigram scoring joins the pruned model tables via broadcast (tiny
    here; a web-scale vocab would shuffle-join on the same keys) — no
    cartesian, no single-partition stage."""
    df = q("t19_trigram_backoff")
    assert has_broadcast_join(df)
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_p35_doremi_windows_run_on_source_dimension(q):
    """The DoReMi normalization's unpartitioned windows run AFTER the
    per-source aggregate — the plan's SinglePartition frames hold
    |sources| rows, and every corpus-scale exchange keys on the bigram /
    source keys."""
    df = q("p35_doremi_weights")
    plan = physical_plan(df)
    assert "hashpartitioning(source" in plan
    # the single-partition window must sit above the source aggregate,
    # never above corpus-scale rows: the aggregate appears before the
    # first SinglePartition exchange in the plan text.
    agg_pos = plan.find("hashpartitioning(source")
    single_pos = plan.find("SinglePartition")
    assert single_pos == -1 or agg_pos != -1


def test_s22_radius_search_is_one_map_side_scan(q):
    """Radius search is the purest scan shape in the ANN family: the
    query batch broadcasts, the radius filter fuses into the corpus
    projection, and the ONLY shuffle exchange is the terminal
    presentation sort over output-sized rows (the small-file spread is a
    round-robin repartition — a no-op on well-partitioned production
    inputs)."""
    df = q("s22_radius_search")
    assert has_broadcast_join(df)
    assert exchange_count(df) <= 1
    assert "SinglePartition" not in physical_plan(df)


def test_s23_hard_negatives_topk_is_qid_window(q):
    """Hard-negative mining broadcasts the query batch; per-query top-k
    is a window over the 8 query keys, never a global sort of the scored
    corpus."""
    df = q("s23_hard_negatives")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    assert "hashpartitioning(query_id" in plan
    assert exchange_count(df) <= 2


def test_s24_tombstone_serve_prunes_and_broadcasts(q):
    """Tombstone-aware serving must keep s17's scan shape — probed-cell
    PartitionFilters at the index FileScan — and exclude deletes via a
    BROADCAST anti-join (the tombstone set never shuffles the
    candidates); top-k stays a qid window."""
    df = q("s24_ivf_serve_with_deletes")
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any(
        "PartitionFilters" in ln and "cell" in ln.split("PartitionFilters", 1)[1][:160]
        for ln in scan_lines
    ), scan_lines
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "hashpartitioning(qid" in plan


def test_q59_wau_contribution_explode_is_activity_scale(q):
    """DAU/WAU must avoid running-distinct state: the trailing-window
    membership comes from joining activity rows against the BROADCAST
    observed-day dimension (never a corpus-side range shuffle), and every
    shuffle keys on (user, day) / day. No SinglePartition anywhere."""
    df = q("q59_dau_wau_stickiness")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or has_broadcast_join(df)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan
    assert "hashpartitioning(day" in plan


def test_q61_bucketed_join_is_exchange_free_below_the_join(q):
    """The bucketing lever: once lineitem/orders are WRITTEN bucketed on
    the join key, the SortMergeJoin between them must have NO Exchange on
    either input — the shuffle was paid once at ingest. Only the post-join
    groupBy and the terminal sort may exchange."""
    df = q("q61_bucketed_join")  # builds the bucketed tables, returns serve plan
    plan = physical_plan(df)
    assert "SortMergeJoin" in plan
    # Split at the join: everything after (= below, in toString layout) the
    # SMJ line up to the end of the tree section must be exchange-free.
    tree = plan.split("== Physical Plan ==")[-1]
    below = tree.split("SortMergeJoin", 1)[1].split("\n\n", 1)[0]
    assert "Exchange" not in below, f"join inputs shuffle:\n{below}"
    # Both scans read the bucketed tables, not raw parquet.
    assert "bkt_lineitem" in plan and "bkt_orders" in plan


def test_s25_knn_graph_is_bucket_bounded(q):
    """The kNN graph must come from the LSH bucket self-join (bucket/sub
    equi-keys), never an all-pairs corpus product: no cartesian, and the
    only corpus-wide exchanges key on the bucket tuple / the per-vector
    window."""
    df = q("s25_knn_graph")
    plan = physical_plan(df)
    assert not has_cartesian(df)
    # the pair join is an EQUI-join on the (bucket, sub) keys — whichever
    # physical strategy AQE picks at this SF (broadcast here, SMJ at scale)
    assert any(
        j in plan for j in ("BroadcastHashJoin [ba", "SortMergeJoin [ba", "ShuffledHashJoin [ba")
    ), plan
    assert "hashpartitioning(vec_id" in plan  # per-vector top-k window


def test_d20_matrix_share_window_is_matrix_sized(q):
    """d20's share window runs over the grouped source-pair matrix; the
    single-partition exchange it needs must sit above the groupBy (matrix
    rows), and document label joins must not be cartesian."""
    df = q("d20_cross_source_dup_matrix")
    plan = physical_plan(df)
    assert not has_cartesian(df)
    assert plan.count("Exchange SinglePartition") <= 2  # share window + terminal sort


def test_q62_partitioned_scan_prunes_directories(q, spark, sf_dir):
    """The date predicate must be a PartitionFilter (directory pruning at
    planning time) with NO residual row-level DataFilters — at 100 TB of
    events this is the difference between reading 3 days and 3 years."""
    from dbt_osmosis_spark.operators.relational_ext3 import partition_pruned_scan

    q("q62_partitioned_layout")  # builds the partitioned layout
    df = partition_pruned_scan(spark, sf_dir)
    plan = physical_plan(df)
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan
    assert any("PartitionFilters: [" in l and "day" in l.split("PartitionFilters:")[1] for l in scan_lines)
    assert all("DataFilters: []" in l for l in scan_lines), scan_lines


def test_d21_tuning_sweep_single_signature_pass(q):
    """The banding sweep must reuse ONE cached signature build (the
    InMemoryTableScan appears on both join sides), key the pair join on
    the (cfg, band, band_key) tuple, and never go cartesian."""
    df = q("d21_lsh_tuning_curve")
    plan = physical_plan(df)
    assert not has_cartesian(df)
    assert "InMemoryTableScan" in plan
    assert "cfg" in plan and "band_key" in plan


def test_q63_skyline_no_allpairs(q):
    """The Pareto frontier must use the bucket-offset decomposition — no
    NOT-EXISTS anti-join against the full point set (that's the oracle's
    job), no cartesian, and the only unpartitioned window runs over
    |bins|-row aggregates."""
    df = q("q63_pareto_frontier")
    plan = physical_plan(df)
    assert not has_cartesian(df)
    assert "hashpartitioning(bin" in plan  # in-bin strict running max


def test_t21_heaps_fit_is_vocabulary_scale(q):
    """Heaps fit: the corpus is touched by ONE exploded word aggregate and
    one doc-rank window; the fit itself runs on 10 rows per source. No
    cartesian, no corpus re-join after the first-occurrence aggregate."""
    df = q("t21_heaps_law")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(source" in plan


def test_q64_attribution_join_is_user_keyed(q):
    """Multi-touch attribution must shuffle on user_id for the interval
    join (time predicate prunes within user), then window on purchase_id —
    never a cross join across users."""
    df = q("q64_multitouch_attribution")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(purchase_id" in plan


def test_q65_rfm_no_user_dimension_window(q):
    """RFM scoring must come from ONE tiny percentile aggregate broadcast
    back — no ntile()/percent_rank() single-partition window over the user
    dimension (the textbook RFM scale trap)."""
    df = q("q65_rfm_segments")
    plan = physical_plan(df)
    # ("percentile(" contains "ntile(" — strip it before the window check)
    assert "ntile(" not in plan.replace("percentile(", "") and "percent_rank" not in plan
    assert has_broadcast_join(df)


def test_m12_components_contract_identical_hashes_first(q):
    """The pHash cluster report must band DISTINCT hashes (quotient
    contraction — groupBy(phash) feeds the join), never the raw image
    corpus, and the pair join must stay keyed (no cartesian)."""
    df = q("m12_phash_components")
    assert not has_cartesian(df)
    plan = physical_plan(df)
    assert "hashpartitioning(phash" in plan


def test_d23_triangles_degree_oriented_no_allpairs(q):
    """Triangle counting must be the compact-forward join: the wedge join
    keys on the pivot vertex, the closure is an equi-semi-join on the
    canonical (a, b) pair — no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere except the 1-row scalar cross-joins
    that assemble the output row."""
    df = q("d23_dupgraph_triangles")
    plan = physical_plan(df)
    assert not has_cartesian(df)
    assert "LeftSemi" in plan  # the closure check is a semi-join
    assert "hashpartitioning(q" in plan or "BroadcastHashJoin [q" in plan or "SortMergeJoin [q" in plan
    # BNLJ may appear ONLY for the 1-row scalar assembly (IdentityBroadcast),
    # never with a join condition (the OR-of-direction all-pairs shape)
    import re
    for m in re.finditer(r"BroadcastNestedLoopJoin BuildRight, (Cross|Inner)([^\n]*)", plan):
        assert "least" not in m.group(2) and "greatest" not in m.group(2), m.group(0)
    assert df.count() == 1
