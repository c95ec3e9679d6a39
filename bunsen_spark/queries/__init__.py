"""Headline query registry.

Aggregates per-module ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL) dicts that
``__spark_entry__`` exposes to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some testdata generations write parquet TIMESTAMP(NANOS), which Spark
    # can only read as int64 epoch-nanos with this conf; other generations
    # write plain microsecond timestamps, where the conf is a no-op. The
    # driver's correctness gate builds its own SparkSession (not our session
    # factory), so the conf must be applied here, on whatever session we are
    # handed. It is runtime-settable. Query code must not assume either
    # representation — use ts_us() to get epoch-microseconds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session timezone on whatever session we are handed, for
    # the same reason: ts_us() documents that the NTZ→TZ cast
    # reinterprets naive values as UTC. On a driver session inheriting
    # a non-UTC machine timezone, unix_micros(cast(ntz as timestamp))
    # would shift by the zone offset while DuckDB's epoch_us(ts) would
    # not — every events-based gate query would hash-mismatch.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds Column for a timestamp column, regardless of how
    the parquet fixture encodes it: int64 epoch-nanos (nanosAsLong read of
    TIMESTAMP(NANOS)) or a real timestamp/timestamp_ntz (microsecond
    parquet). Matches DuckDB's ``epoch_us(ts)`` on the same files — the
    session timezone is pinned to UTC, so the NTZ→TZ cast reinterprets the
    naive value as UTC exactly like DuckDB's naive epoch."""
    from pyspark.sql import functions as F

    dt = df.schema[col].dataType.simpleString()
    if dt in ("bigint", "long"):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


# The driver's per-round correctness gate samples a PREFIX of the
# registration order (r1: first 34, r2/r3: 47, r4/r5: 50), so queries
# registered late may never receive a driver-verified row even though they
# pass the local oracle (tools/oracle_check.py). ``_reorder`` therefore
# emits three priority groups:
#   0: entries listed in the first ``_NEVER_DRIVER_CHECKED`` slots below —
#      registered in a past round but NEVER driver-checked (they sat past
#      every prefix); they have waited the longest and go absolutely first;
#   1: brand-new entries (absent from this list), alphabetically;
#   2: the rest of this list — already driver-checked at least once,
#      ordered stalest-check-first (regenerated each round from the
#      accumulated CORRECTNESS_r*.json artifacts).
_DRIVER_ORDER = [
    # never driver-checked through round 5 (all six re-verified green in
    # the round-5 local oracle run; registry positions 50-55 last round)
    "text_surprisal_score", "vocab_encode_checksums",
    "vocab_shift_even_odd", "weighted_sample_counts",
    "window_running_value_hotkey", "winsorized_price_stats",
    "ann_brute_topk", "ann_lsh_topk", "dataset_split_counts",
    "corpus_top_ngrams", "corpus_length_quantiles", "dedup_clusters",
    "ann_ivf_topk", "stratified_sample_counts", "doc_top_terms",
    "pack_chunks", "decontaminate_overlap", "sample_per_lang",
    "quality_filter_funnel", "multimodal_image_features",
    "closure_part_hierarchy", "valueset_membership_lineitem",
    "translate_order_priority", "asof_purchase_last_view",
    "asof_forward_next_view", "nations_with_customers_and_suppliers",
    "parts_never_ordered", "orders_above_customer_avg",
    "events_props_extract", "range_join_purchase_views",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_volume",
    "q2_min_cost_supplier", "q4_priority_late_ship", "q7_nation_volume",
    "q10_returned_revenue", "q14_promo_revenue",
    "q16_parts_supplier_counts", "q17_small_quantity_revenue",
    "q18_large_volume_orders", "q15_top_supplier",
    "q19_disjunctive_revenue", "q21_sole_late_shipper",
    "q22_dormant_customers", "topk_brands_by_revenue", "window_order_rank",
    "window_running_value", "window_running_value_bucketed",
    "sessionize_events", "sessionize_events_bucketed", "rollup_returns",
    "cube_revenue", "tumbling_window_counts", "hopping_window_counts",
    "skew_salted_order_totals", "customers_without_orders",
    "suppliers_with_large_shipments", "pivot_user_events",
    "events_daily_active_users", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q11_important_parts", "q12_priority_shipping",
    "q13_customer_distribution", "q20_significant_suppliers",
    "text_language_id", "text_quality", "text_token_stats",
    "text_fingerprint", "text_repetition", "dedup_exact",
    "dedup_keep_best", "dedup_incremental", "text_scrub_counts",
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding", "ann_ivf_kmeans_topk", "embedding_quantize_stats",
    "multimodal_audio_features", "multimodal_resize_means",
    "multimodal_frame_stats", "bloom_prefilter_supplier_volume",
    "doc_chunk_windows", "countmin_user_frequencies",
    "dedup_incremental_near", "corpus_mix_counts",
    "event_transition_counts", "asof_bucketed_purchase_last_view",
    "event_funnel_counts", "cohort_retention_counts",
    "pagerank_trade_network", "bm25_multiquery_topk", "bm25_search_topk",
    "budget_select_per_lang", "chunk_positive_pairs",
    "compaction_plan_bins", "corpus_report_by_source",
    "curation_pipeline_counts", "daily_top_event_types",
    "decayed_user_engagement", "dedup_cluster_keep_best",
    "dedup_containment", "dedup_prefix_jaccard", "dedup_substring_spans",
    "embedding_gram_matrix", "engagement_pipeline_users",
    "fuzzy_join_even_odd", "heavy_hitter_users",
    "linkage_candidates_customers", "median_quantity_by_flag",
    "minmax_order_prices", "negative_pairs_sample", "outlier_event_values",
    "part_basket_triangles", "quality_quantile_filter",
    "resample_user_days", "rfm_user_segments", "scd2_documents",
    "session_path_top", "sessionize_events_hotkey",
    "snapshot_diff_documents", "source_cap_kept", "source_overlap_mirror",
    "split_leakage_pairs", "temperature_mix_counts",
    "text_bigram_surprisal",
]


_NEVER_DRIVER_CHECKED = 6  # prefix of _DRIVER_ORDER with no driver row yet


def _reorder(out: dict) -> dict:
    rank = {n: i for i, n in enumerate(_DRIVER_ORDER)}
    # Priority groups for the driver's prefix-sampled gate:
    #   0: entries that existed in round 4 but have NEVER had a driver
    #      row (the gate sampled exactly a registration-order prefix
    #      every round, and these sat past it) — they have waited the
    #      longest, so they go absolutely first;
    #   1: brand-new entries (not in _DRIVER_ORDER), alphabetically —
    #      the QUERIES and ORACLES dicts may register them in
    #      different module order, and the two registries must align;
    #   2: everything else, oldest-driver-check first.
    def key(n: str):
        r = rank.get(n)
        if r is not None and r < _NEVER_DRIVER_CHECKED:
            return (0, r, n)
        if r is None:
            return (1, 0, n)
        return (2, r, n)

    names = sorted(out, key=key)
    return {n: out[n] for n in names}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # no ImportError swallowing: these modules depend only on pyspark +
    # stdlib, so a failure here is a bug that must surface, not a
    # missing optional dependency (silently dropping a module would
    # shrink the correctness gate by 20+ queries)
    from . import domain, pipeline, pipeline_extra, pipeline_r5, pipeline_r5b, relational, tpch_extra

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(tpch_extra.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(pipeline_extra.QUERIES)
    out.update(pipeline_r5.QUERIES)
    out.update(pipeline_r5b.QUERIES)
    out.update(domain.QUERIES)
    return _reorder(out)


def all_oracles() -> dict[str, str]:
    from . import domain, pipeline, pipeline_extra, pipeline_r5, pipeline_r5b, relational, tpch_extra

    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(tpch_extra.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(pipeline_extra.ORACLES)
    out.update(pipeline_r5.ORACLES)
    out.update(pipeline_r5b.ORACLES)
    out.update(domain.ORACLES)
    return _reorder(out)
