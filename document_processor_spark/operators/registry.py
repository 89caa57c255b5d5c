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
# ROUND-5 ROTATION PLAN: once r4 lands driver rows for the current
# 50-slot window (3 r3-fixes + 23 r3-never-checked stream/cur/mm/pipe +
# 19 session-7..12 ops + 5 session-3 ops), swap this list for the queries
# that will then have NO driver row in any round.  The session-13/14
# additions parked at the head of the post-boundary tail
# (dedup_lsh_recall, dedup_edit_verify, mm_image_tiles, ann_rerank_exact,
# dedup_soft, ta_kneser_ney, ta_quality_auc, ta_tokenizer_fertility) go
# FIRST — they are the newest code with only mirror+pytest proof.  Then
# the exact residue, recomputed against CORRECTNESS_r01..r03 at the
# 163-query surface (60 names; pick the first 50, park the rest):
# pipe_extract_skew, stream_sliding_hourly, rel_rolling_1h,
# ta_length_quantiles, cur_domain_cap, dedup_pagerank, rel_pivot,
# rel_set_ops, stream_session_window, pipe_extract_synth_source,
# pipe_extract_jsonl_roundtrip, dedup_components_star,
# ta_hll_distinct, ta_cms_heavy_hitters, cur_bloom_decontaminate,
# rel_cdc_apply, stream_join_attribution, rel_scd2_history,
# rel_cohort_retention,
# dedup_triangles, dedup_prefix_jaccard, ann_recall_eval,
# ta_skipgram_pairs, ta_hash_classifier, ta_textrank_keywords,
# ta_source_vocab_overlap, ta_phrase_search, ta_bpe_encode,
# ta_sentence_stats, rel_waiting_suppliers, rel_idle_customers,
# rel_priority_wait, rel_promo_share, rel_forecast_revenue,
# rel_small_qty_revenue, rel_disjunctive_revenue, rel_top_supplier,
# rel_supplier_concentration, rel_min_price_supplier, rel_region_trade,
# rel_market_share, rel_product_profit, rel_part_supplier_counts,
# rel_dominant_suppliers, rel_event_transitions, rel_twap,
# rel_interval_coverage, rel_json_props, rel_range_join,
# rel_gapfill_locf, rel_moments_corr, rel_local_supplier_volume,
# rel_skew_salted_join, rel_large_orders, rel_priority_class,
# rel_order_count_hist, mm_audio_fingerprint, mm_media_dedup,
# cur_universe_sample, cur_keep_best, cur_score_normalize, cur_url_dedup,
# stream_static_enrich — then the long-parked stable families (ext_*
# holds BOTH r02 and r03 driver-green rows on unchanged code, the one
# place an older row still certifies the current tree).
_PRIORITY: tuple[str, ...] = (
    # slots 1-3: CHANGED this round to close r3 VERDICT items (the one red
    # row ann_kmeans_train; the tfidf broadcast drop; the components
    # window->groupBy swap) — driver rows prove the fixes, so these can
    # NEVER fall out of the 50-slot window
    "ann_kmeans_train", "ta_tfidf_topk", "dedup_components",
    # r3-shipped, never driver-checked (VERDICT item 1: stream/cur/mm/pipe)
    "stream_tumbling_hourly", "stream_dedup_replay",
    "stream_extract_snapshot", "stream_running_totals",
    "cur_corpus_build", "cur_decontaminate", "cur_stratified_sample",
    "cur_pack_sequences", "cur_pii_redact", "cur_quality_gate",
    "cur_dsir_select", "cur_shard_export", "cur_temperature_mix",
    "cur_zorder_layout",
    # mm_media_features/decode/resize hold their r02 driver rows
    # (unchanged since) — parked outside the 50-row window
    "mm_frame_sample", "mm_media_transcode", "mm_phash_neardup",
    "pipe_extract_catalyst", "pipe_extract_arrow", "pipe_extract_page_range",
    "pipe_extract_ocr_fast", "pipe_extract_ocr_full", "pipe_extract_curate",
    # new this round (sessions 7-12) — 19 queries
    "ann_sq8_topk", "cur_chunk_overlap", "cur_k_anonymity",
    "dedup_sorted_blocking", "ta_boolean_search",
    "stream_late_data", "cur_hilbert_layout", "mm_scene_cut",
    "ann_mips_topk", "rel_cube_mix", "cur_dp_count", "ta_hist_quantiles",
    "ta_containment",
    "dedup_entity_resolve", "mm_binary_ingest", "pipe_extract_csv_roundtrip",
    "mm_audio_vad", "ta_rake_keyphrases", "rel_skyline_suppliers",
    # new this round (session 3) — the last 5 window slots
    "dedup_exact_substr", "ta_pmi_collocations", "ta_bpe_merges",
    "cur_fuzzy_decontaminate", "pipe_extract_orc_roundtrip",
    # ---- 50-slot window boundary (session-2 batch onward roll to r5) ----
    # session-13/14 ops land just past the boundary: mirror+pytest
    # certified this round, first in line for an r5 driver row
    "ann_rerank_exact", "dedup_soft", "ta_kneser_ney", "ta_quality_auc",
    "ta_tokenizer_fertility", "ann_filtered_topk",
    "dedup_lsh_recall", "dedup_edit_verify", "mm_image_tiles",
    "ta_hll_distinct", "ta_cms_heavy_hitters", "cur_bloom_decontaminate",
    "rel_cdc_apply", "stream_join_attribution", "rel_scd2_history",
    "rel_cohort_retention",
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
