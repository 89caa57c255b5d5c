"""Aggregated query registry for the driver contract (__spark_entry__).

Every entry pairs a Spark DataFrame implementation with a DuckDB-runnable
ANSI-SQL oracle (or None for genuinely non-SQL-expressible operators, which
get the driver's weaker rows-only check)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate samples the FIRST 50 registry entries, so
# ordering is exposure: queries named here are emitted first (in this
# order), everything else follows in module order.  Keep (a) queries that
# have never had a driver CORRECTNESS row and (b) queries whose
# implementation changed this round at the head of this list; rotate
# long-stable green families into the tail.
#
# ROUND-5 ROTATION PLAN: once r4 lands driver rows for the names below,
# swap this list for the queries with no r4 row: FIRST the 19 that have
# never had a driver row in ANY round (exact list, recomputed against
# CORRECTNESS_r01..r03 at the 119-query surface):
# rel_json_props, rel_range_join, rel_gapfill_locf, rel_moments_corr,
# rel_local_supplier_volume, rel_skew_salted_join, rel_large_orders,
# rel_priority_class, rel_order_count_hist,
# cur_url_dedup, cur_score_normalize, cur_keep_best,
# ta_bpe_encode, ta_sentence_stats, ta_phrase_search,
# ta_source_vocab_overlap, dedup_triangles, dedup_prefix_jaccard,
# mm_media_dedup, rel_waiting_suppliers, rel_idle_customers,
# rel_priority_wait, rel_promo_share, rel_event_transitions, rel_twap,
# ta_skipgram_pairs, stream_static_enrich, ta_textrank_keywords,
# cur_universe_sample, rel_interval_coverage, mm_audio_fingerprint,
# the eight displaced from the r4 window by the session-7/8 batches:
# ta_length_quantiles, cur_domain_cap, dedup_pagerank, rel_pivot,
# rel_set_ops, stream_session_window, pipe_extract_synth_source,
# pipe_extract_jsonl_roundtrip,
# and the session-6 batch: rel_forecast_revenue, rel_small_qty_revenue,
# rel_disjunctive_revenue, rel_top_supplier, rel_supplier_concentration,
# rel_min_price_supplier, rel_region_trade, rel_market_share,
# rel_product_profit, rel_part_supplier_counts, rel_dominant_suppliers,
# ta_hash_classifier, ann_recall_eval —
# then
# the long-parked stable families (ext_*, dedup_*, ann_* minus kmeans,
# ta_* minus the r4 sketches, rel_* classics, mm_media_*).  That pool
# exceeds 50 slots: park the overflow inside ext_* at the very end —
# that family holds BOTH r02 and r03 driver-green rows and unchanged
# code, the one place where an older row still certifies the current
# tree.
_PRIORITY: tuple[str, ...] = (
    # new this round (session 10)
    "dedup_entity_resolve",
    "mm_binary_ingest", "pipe_extract_csv_roundtrip", "mm_audio_vad",
    # new this round (session 9)
    "ann_mips_topk",
    "rel_cube_mix", "cur_dp_count", "ta_hist_quantiles", "ta_containment",
    # new this round (session 8)
    "stream_late_data", "cur_hilbert_layout", "mm_scene_cut",
    # new this round (session 7)
    "ann_sq8_topk", "cur_chunk_overlap", "cur_k_anonymity",
    "dedup_sorted_blocking", "ta_boolean_search",
    # new this round (session 3)
    "dedup_exact_substr", "ta_pmi_collocations", "ta_bpe_merges",
    "cur_fuzzy_decontaminate", "pipe_extract_orc_roundtrip",
    # new this round (session 2)
    "ta_hll_distinct", "ta_cms_heavy_hitters", "cur_bloom_decontaminate",
    "rel_cdc_apply", "stream_join_attribution", "rel_scd2_history",
    "rel_cohort_retention",
    # r3-shipped, never driver-checked (stream/cur/mm/pipe = 26 queries)
    "stream_tumbling_hourly", "stream_dedup_replay",
    "stream_extract_snapshot", "stream_running_totals",
    "cur_corpus_build", "cur_decontaminate", "cur_stratified_sample",
    "cur_pack_sequences", "cur_pii_redact", "cur_quality_gate",
    "cur_dsir_select", "cur_shard_export", "cur_temperature_mix",
    "cur_zorder_layout",
    # mm_media_features/decode/resize hold their r02 driver rows
    # (unchanged since) — parked outside the 50-row window for the
    # session-3 queries
    "mm_frame_sample", "mm_media_transcode", "mm_phash_neardup",
    "pipe_extract_catalyst", "pipe_extract_arrow", "pipe_extract_page_range",
    "pipe_extract_ocr_fast", "pipe_extract_ocr_full", "pipe_extract_curate",
    # changed this round — need fresh driver rows
    "ann_kmeans_train", "ta_tfidf_topk", "dedup_components",
    # new this round
    "dedup_components_star", "pipe_extract_skew", "stream_sliding_hourly",
    "rel_rolling_1h", "ta_length_quantiles", "cur_domain_cap",
    "dedup_pagerank", "rel_pivot", "rel_set_ops", "stream_session_window",
    "pipe_extract_synth_source", "pipe_extract_jsonl_roundtrip",
)


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    # imports fail LOUDLY: a broken operator module must surface as a
    # driver error, not silently shrink the query surface
    import importlib

    from . import extraction_ops
    raw: dict[str, tuple[QueryFn, str | None]] = {}
    raw.update(extraction_ops.QUERIES)
    for mod_name in ("dedup", "ann", "text_analysis", "relational",
                     "multimodal", "pipeline_ops", "curation", "stream_ops"):
        mod = importlib.import_module(f".{mod_name}", __package__)
        raw.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in raw]
    if missing:  # a renamed/removed query must fail loudly, not silently
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    out: dict[str, tuple[QueryFn, str | None]] = {
        n: raw[n] for n in _PRIORITY}
    out.update((n, q) for n, q in raw.items() if n not in out)
    return out
