"""Query registry — the engine's public operator surface.

Every operator from SURVEY.md §2 (reference Tier A + charter Tier B) is
exposed as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, where SQL-expressible, an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet fixtures. The driver hash-compares the
two at sf0.01 — this registry IS the correctness surface.

Conventions (required for oracle hash-matching):
- every computed column is aliased identically on both sides;
- double aggregates are ``round()``-ed on both sides (float summation
  order differs between engines);
- sums of integer columns are cast to BIGINT in the oracle (DuckDB
  promotes int sums to HUGEINT, Spark to LONG);
- timestamps that cross the boundary are compared as epoch BIGINT.

Scale notes are attached per query: the fixture runs at sf0.01/0.1 but
each plan is written for the 100 TB shape (broadcast dims, partial
aggs, no driver-side collection, pushdown-friendly predicates).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.readers import read_parquet_table
from ..operators import relational as R


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)




# =====================================================================
# Driver-contract exports
# =====================================================================


def _ordered_names() -> list[str]:
    """Registry names with the driver-priority slots first.

    The driver verifies the FIRST 50 entries of ``queries()`` per
    round; registration order alone left 38 of round 1's queries with
    no driver correctness row (VERDICT r1 item 1). ``_DRIVER_PRIORITY``
    (defined at the end of this module, after all registrations) pins
    the 50 slots to maximize per-round category coverage; everything
    else follows in registration order and rotates into future rounds.
    """
    priority = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(priority)]
    return priority + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """``name -> (spark, sf_dir) -> DataFrame`` for every registered op."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible registered op."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }




_DRIVER_PRIORITY: list[str] = [
    # Round-4 slots (VERDICT r3 "next round" item 1). 1-3: the three
    # stale event-time rows — driver-greened in r1 against the old
    # ns-long fixtures, never re-certified after the TIMESTAMP_NTZ
    # reader fix (sessionization is BENCH_r02's crash site).
    "sessionization",
    "range_join_events",
    "streaming_tumbling_window",
    # 4-9: the ANN/LSH tier, newly DRIVER-FALSIFIABLE (VERDICT r3 item
    # 3): exact-twin top-1 ids + recall-bound booleans (ANN) and
    # exact-integer pair/cluster equality against O(n^2) oracles
    # (dedup). These leave the no_oracle bucket this round.
    "ann_lsh_topk",
    "ivf_ann_topk",
    "ivf_pq_ann_topk",
    "minhash_native_dedup",
    "minhash_lsh_dedup",
    "neardup_clusters",
    # 10: re-certify after the 6x-duplicated-aggregate fix (same hash,
    # new 1-exchange plan — VERDICT r3 "what's wrong" item 1).
    "correlation_matrix_exact",
    # 11-12: remaining file-format connectors (csv twin is r2-green).
    "json_source_roundtrip",
    "orc_source_roundtrip",
    # 13-18: credit-risk tier (ties to reference spark.py:71-73
    # evaluator surface) — entirely driver-unchecked until now.
    "roc_auc_banded",
    "ks_risk_separation",
    "woe_iv_score_bands",
    "psi_score_drift",
    "gains_lift_bands",
    "threshold_confusion_sweep",
    # 19-26: statistics tier.
    "welch_t_test",
    "target_encoding",
    "chi_square_independence",
    "autocorrelation_daily_revenue",
    "seasonality_dow_profile",
    "mannwhitney_amount_by_status",
    "benfords_law_digits",
    "gini_concentration",
    # 27-31: corpus-governance tier.
    "domain_mix_rebalance",
    "dedup_rate_by_source",
    "contamination_overlap_matrix",
    "cusum_changepoint_daily",
    "referential_integrity_audit",
    # 32-37: product-analytics / sequence tier.
    "max_concurrent_sessions",
    "event_trigram_topk",
    "growth_accounting_weekly",
    "cohort_ltv",
    "market_basket_lift",
    # 38-42: exact-quantile / distribution tier.
    "scd2_asof_fact_join",
    "weighted_median_exact",
    "histogram_equi_depth",
    "entropy_kl_event_mix",
    "rolling_median_28d",
    # 42-46: the four queries that left the no_oracle bucket this
    # session (VERDICT r3 item 3 asks for green CORRECTNESS_r04 rows)
    # plus the new full-outer stream-stream join.
    "simhash_dedup",
    "als_recommendations",
    "pca_embeddings",
    "ml_learning_curve",
    "streaming_full_outer_join",
    # 47-50: highest-information remainder of the r3 queue
    # (seasonal_naive_backtest, dedup_keep_latest,
    # containment_detection, window_topk_with_ties,
    # survival_kaplan_meier rotate to round 5).
    "lateral_topk_join",
    "inverted_index_postings",
    "cluster_canonical_keeper",
    "lm_bigram_surprisal",
    # Round-5 rotation queue (strict-local-verified, still without a
    # driver row after this round). Lead with the round-4 session-5
    # additions — winnowing_fingerprint_overlap (MOSS fingerprints,
    # packed-key rightmost-min), duplicated_ngram_span_fraction
    # (Lee-et-al exact substring spans, sweep-line union),
    # isotonic_calibration_pava (max-min PAVA on exact scaled
    # integers), brier_decomposition_bands (integer Brier + Murphy
    # identity boolean), naive_bayes_lang_classify (declarative NB
    # train+infer), reciprocal_rank_fusion,
    # phrase_query_positional_index (independent-algorithm oracle),
    # image_ahash_dedup (real BMP decode -> perceptual hash),
    # grouping_sets_report, moment_stats_skew_kurtosis,
    # bitwise_bool_aggregates, dynamic_partition_pruning_join
    # (dynamicpruning plan-pinned), zipf_slope_token_frequency,
    # sql_udf_price_tiers (SQL UDF inlined to codegen),
    # parameterized_query_markers, nearest_event_join (bidirectional
    # as-of, zero joins), knn_classify_exact,
    # multivariate_ols_normal_eq (Cramer 3x3 on exact moments),
    # decision_stump_exact (rational Gini argmax),
    # item_item_collaborative_topk (oracle-exact CF twin of ALS),
    # sprt_sequential_test (anytime-valid Wald monitor),
    # t_closeness_audit (privacy trio complete), ranking_ndcg_eval,
    # polygon_shoelace_area_centroid, loan_amortization_schedule
    # (pure-integer banking recursion, recursive-CTE oracle),
    # exchange_reuse_extremes (ReusedExchange plan-pinned),
    # nested_order_lines_hof, unpivot_melt_reshape,
    # governed_view_masking, compression_codec_roundtrip,
    # join_strategy_hints, mutual_information_features,
    # weighted_sample_without_replacement (A-ES integer keys),
    # rolling_beta_28d — then the session-7 additions —
    # streaming_session_window (state-store-MERGED sessions, the
    # third and last streaming window kind), anova_oneway_f (k-group
    # classical test from exact moments), mcnemar_paired_test
    # (paired-classifier discordant cells), runs_test_randomness
    # (Wald-Wolfowitz), largest_remainder_apportionment (Hamilton,
    # zero-float integer quotas), fifo_inventory_matching
    # (cumulative-interval-overlap closed form vs sequential-walk
    # test) — then the session-7b additions — npv_irr_bisection
    # (28-step unrolled bisection, generated CTE-chain oracle),
    # cochran_armitage_trend, arrow_grouped_agg (applyInArrow cell),
    # observe_metrics_inline (Observation API), udtf_table_argument
    # (polymorphic TABLE-argument UDTF), transpose_metrics
    # (df.transpose), chunk_dedup_rewrite (first-occurrence chunk
    # dedup rewrite), bitemporal_asof_join (two-time-axis as-of),
    # poisson_rate_ratio_test, url_parse_functions (urllib-
    # cross-checked), aes_roundtrip_functions (structural crypto
    # oracle), sqlite_batch_sink_roundtrip (DataSourceWriter batch
    # commit), cohens_kappa_agreement, levene_brown_forsythe (exact
    # integer variance-homogeneity check), jarque_bera_normality,
    # and the four queries that left the no_oracle
    # bucket this session (the last of it — every registered query now
    # carries an oracle): simhash_dedup (exact J>=0.9 pair set +
    # Hamming-locality bound booleans with a negative control),
    # als_recommendations (probe-user set + catalog/hit-rate bounds),
    # pca_embeddings (orthonormality/EVR-band invariant booleans),
    # ml_learning_curve (pinned nested-subset counts + AUC bands),
    # streaming_full_outer_join (completes the stream-stream join
    # matrix; both NULL extensions watermark-proofed, asymmetric
    # eviction horizons encoded relationally by the oracle) —
    # then the round-4 session-4 additions — kmeans_lloyd_exact (two exact Lloyd iterations),
    # simhash_portable_dedup (portable rolling hash, full oracle),
    # dtw_weekday_profile_pairs (unrolled 7x7 DP alias chain),
    # interval_union_coverage (single-window sweep-line union),
    # viterbi_state_decode (integer HMM decode vs recursive CTE),
    # audio_spectral_peaks + semdedup_cluster_prune (below),
    # zorder_pruning_stats (integer Morton layout math,
    # structural prune booleans), bucketed_join_no_shuffle (co-bucketed
    # catalog tables, zero-Exchange SMJ), geo_grid_knn_join (lossless
    # radius-bounded NN blocking vs brute-force oracle),
    # geohash_encode_topk (closed-form integer geohash),
    # point_in_polygon_ray_cast (division-free integer ray casting),
    # holt_linear_forecast_daily (bit-exact applyInPandas recursion vs
    # recursive-CTE oracle), audio_spectral_peaks (real numpy FFT,
    # analytically-pinned peak bin), semdedup_cluster_prune (SemDeDup
    # clustered prune hash-equal to the quadratic oracle) — then the
    # session-3 additions — sqlite_source_roundtrip (JDBC-tier embedded-SQL
    # connector: rowid-range partitioned reads + WHERE pushdown),
    # theta_sketch_distinct_ops (KMV set algebra, oracle reproduces
    # the whole estimator), count_min_point_queries,
    # bloom_filter_join_prune, session_window_dynamic_gap (per-event
    # gap expression), streaming_left_outer_join (watermark-gated
    # NULL extension), sqlite_cdc_streaming_tail (Python DataSource
    # stream reader, high-water-mark offsets),
    # sqlite_streaming_sink_roundtrip (transactional stream sink,
    # full connector matrix), dp_randomized_response (local-DP
    # release, congruence-replayable), sql_scripting_median_bisection
    # (Spark 4 procedural SQL) — then the earlier round-4 additions —
    # image_decode_stats / audio_decode_stats / video_decode_stats /
    # image_resize_stats (real BMP+PPM / WAV / Y4M codecs + integer
    # nearest-neighbor resize), avro_source_roundtrip (pure-Python
    # Avro container connector), delta_time_travel_roundtrip +
    # delta_merge_upsert (Delta transaction-log protocol),
    # heavy_hitters_sketch (Misra-Gries with proven mergeable bound),
    # edit_distance_threshold_join (lossless bigram-filtered fuzzy
    # join), record_linkage_fellegi_sunter,
    # conformal_prediction_intervals, shapley_channel_attribution,
    # difference_in_differences, quantile_normalization,
    # temperature_sampling_mix, bootstrap_ci_daily_revenue — then:
    # skipgram_cooccurrence,
    # ewma_daily_value, rollup_cascade_daily, tranche_expand,
    # triangle_count_trade_graph, event_transition_matrix,
    # column_profile, contribution_analysis, ordered_list_agg_structs,
    # doc_quality_filter, skew_diagnosis, time_since_last_event,
    # ab_test_conversion, pareto_customers, rolling_active_users,
    # rfm_segmentation, data_freshness_slo, power_analysis_ab,
    # anomaly_zscore_days, basket_size_distribution,
    # score_migration_matrix, skyline_price_size,
    # cdf_transform_vs_reference, fulfillment_lag_distribution,
    # duplicate_transaction_detection, survival analytics follow-ups
    # (journey_pattern_match, funnel_within_window), collated_aggregation,
    # shortest_path_trade_cost, fpgrowth_frequent_itemsets,
    # prefixspan_sequential_patterns, bitmap_distinct_count,
    # spatial_blocked_join, permutation_test_segment, k_anonymity_audit,
    # decayed_leaderboard, seasonal_decomposition_daily,
    # span_corruption_plan, embedding_int8_quantization,
    # streaming_incremental_backfill, pandas_grouped_agg_trimmed_mean,
    # table_diff_summary, run_length_encoding, table_checksum,
    # embedding_dimension_stats, timezone_local_day_agg,
    # hll_rolling_wau, pivot_multi_agg, csv_corrupt_record_audit,
    # balanced_shard_plan, negative_sampling_plan, hard_negative_mining,
    # bpe_merge_training, bpe_tokenize_apply,
    # streaming_append_mode_windows, parquet_schema_evolution,
    # dynamic_partition_overwrite, functional_dependency_audit,
    # argmax_aggregates, incremental_aggregate_maintenance,
    # theil_sen_mann_kendall, logrank_test_segments,
    # cuped_variance_reduction, hll_sketch_rollup_cube,
    # three_way_reconciliation, graph_assortativity,
    # distinctive_terms_by_source, fiscal_calendar_rollup,
    # business_days_lag, graph_edge_churn, forecast_reconciliation,
    # quantized_code_collisions, class_reweighting_plan,
    # revenue_bridge_waterfall, stratified_kfold_assignment,
    # supplier_concentration_hhi, interval_range_window,
    # open_backlog_aging, vocab_growth_curve, traffic_heatmap_dow_hour,
    # role_playing_date_rollup, streaming_checkpointed_file_sink,
    # video_frame_sample_plan, lateral/window long tail. As of this
    # session EVERY registered query carries an oracle — the former
    # rows-only set (als_recommendations, pca_embeddings,
    # ml_learning_curve, simhash_dedup) is now driver-falsifiable via
    # the bound-boolean pattern.
]
