"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``crypto_prediction_etl_spark/``; the query
catalog (Spark builder + DuckDB oracle per operator of SURVEY.md §2)
is assembled by ``crypto_prediction_etl_spark.plans.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from crypto_prediction_etl_spark.plans import registry  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q25_daily_close_stats"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's dbt window-stats mart
    (crypto_daily_close_stats) run natively: candle aggregation ->
    calendar spine -> per-id densify -> rolling windows -> lag ROC ->
    range-stamped union.
    """
    return registry.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


# The driver adjudicates exactly the first 50 ``queries()`` entries per
# round.  Rotation for round 4 (VERDICT r3 item 1): the catalog tail
# q124+ had never received a driver verdict — the window now holds the
# 47 oldest never-adjudicated names (numeric order) plus the three
# queries upgraded this round from rows-only to oracle-backed
# (q23 portable KMV/sampled-quantile profile, q55 unrolled-Lloyd
# k-means, q71 hash-checked multimodal decode), so CORRECTNESS_r04
# records first verdicts / first hash checks for all 50.  The
# remaining never-adjudicated names follow in numeric order (next
# rounds rotate them in); everything else keeps its r1-r3 green row
# and stays covered by the local mirror (tests/test_oracle_parity.py
# + tools/driver_replay.py).
_ADJUDICATE_FIRST = [
    "q124_mfi",
    "q125_donchian",
    "q126_chaikin_adl",
    "q127_pivot_points",
    "q128_char_entropy",
    "q145_adx",
    "q146_trix",
    "q147_cci",
    "q148_top_supplier",
    "q149_supplier_diversity",
    "q150_small_quantity_revenue",
    "q151_large_orders",
    "q152_weighted_jaccard",
    "q153_curriculum_shards",
    "q154_systematic_sample",
    "q155_rolling_beta",
    "q156_percentile_cont",
    "q157_token_ids",
    "q158_bigram_nll",
    "q159_key_skew_profile",
    "q160_snapshot_diff",
    "q161_scd2_intervals",
    "q162_out_of_order",
    "q163_cogrouped_adjust",
    "q164_pagerank",
    "q165_triangle_count",
    "q166_feature_hashing",
    "q167_knn_eval",
    "q168_ab_test_stats",
    "q169_histogram",
    "q170_embedding_dim_stats",
    "q171_quantile_transform",
    "q172_feature_matrix",
    "q173_rolling_pair_corr",
    "q174_seasonal_decompose",
    "q175_cusum_changepoint",
    "q176_kalman_level",
    "q177_benford_digits",
    "q178_revenue_concentration",
    "q179_target_encoding",
    "q180_session_paths",
    "q181_sequence_anomaly",
    "q182_temporal_dim_join",
    "q183_cohort_ltv",
    "q184_group_hash_sample",
    "q185_tick_rule_flow",
    "q186_amihud_illiquidity",
    "q23_approx_aggregates",
    "q55_kmeans_clusters",
    "q71_multimodal_features",
    "q187_underwater_streaks",
    "q188_centroid_outliers",
    "q189_hurst_exponent",
    "q190_subsample_stability",
    "q191_user_entropy",
    "q192_gini_coefficient",
    "q193_ks_test",
    "q194_psi_drift",
    "q195_lorenz_deciles",
    "q196_robust_zscore",
    "q197_seasonality_strength",
    "q198_integrity_audit",
    "q199_column_profile",
    "q200_curation_funnel",
    "q201_tfidf_keywords",
    "q202_langid_confusion",
    "q203_autocorrelation",
    "q204_basket_lift",
    "q205_ar1_fit",
    "q206_volume_profile",
    "q207_rapid_duplicates",
    "q208_srm_check",
    "q209_vector_normalize",
    "q210_pca_power_iteration",
    "q211_wow_growth",
    "q212_mahalanobis_diag",
    "q213_burstiness",
    "q214_hash_collision_audit",
    "q215_lsh_recall_report",
    "q216_capm_alpha",
    "q217_weekly_churn",
    "q218_gap_days",
    "q219_volatility_regimes",
    "q220_price_endings",
    "q221_risk_ratios",
    "q222_ewma_vol",
    "q223_cdc_snapshot",
    "q224_active_users",
    "q225_heavy_hitters",
    "q226_blame_supplier",
    "q227_compaction_planner",
    "q228_k_anonymity",
    "q229_cube_profile",
    "q230_cdc_chunks",
    "q231_rrf_fusion",
    "q232_mmr_diversify",
    "q233_weighted_median",
    "q234_attribution_asof",
    "q235_twap",
    "q236_rfm_segments",
    "q237_weighted_reservoir",
    "q238_negative_sampling",
    "q239_ndcg_eval",
    "q240_calibration_bins",
    "q241_state_merge",
    "q242_pairs_cointegration",
    "q243_skyline",
    "q244_table_checksum",
    "q245_bipower_jumps",
    "q246_roll_spread",
    "q247_auc_roc",
    "q248_gain_deciles",
    "q249_bpe_train",
    "q250_split_leakage",
    "q251_unpivot_profile",
    "q252_token_dropout",
    "q253_bfs_reachability",
    "q254_clustering_effectiveness",
    "q255_encoding_advisor",
    "q256_mutual_information",
    "q257_stratified_effect",
    "q258_binary_segmentation",
    "q259_km_survival",
    "q260_seasonal_naive_mase",
    "q261_cuped_adjustment",
    "q262_linear_interpolation",
    "q263_winsorized_mean",
    "q264_zipf_fit",
    "q265_dedup_explain",
    "q266_theil_sen",
    "q267_concurrency_sweep",
    "q268_item_cooccurrence",
    "q269_recsys_hitrate",
    "q270_lsh_planner",
    "q271_nation_volume",
    "q272_market_share",
    "q273_product_profit",
    "q274_audio_vad_segments",
    "q275_sequential_sprt",
    "q276_schema_evolution_union",
    "q277_activity_heatmap",
    "q278_minhash_error_audit",
    "q279_partition_skew_planner",
    "q280_interval_coverage",
    "q281_identity_resolution",
    "q282_dollar_bars",
    "q283_entropy_rate",
    "q284_design_effect",
    "q285_simpson_detector",
    "q286_kmv_union_merge",
    "q287_interval_backtest",
    "q288_stale_price_audit",
    "q289_rec_coverage_bias",
    "q290_user_features",
    "q291_l_diversity",
    "q292_code_switching",
    "q293_contract_fill_rates",
    "q294_attribution_compare",
    "q295_interarrival_percentiles",
    "q296_permutation_test",
    "q297_component_sizes",
    "q298_cache_planner",
    "q299_holt_winters",
    "q300_momentum_backtest",
    "q301_fair_share",
    "q302_p99_attribution",
    "q303_covariance_matrix",
    "q304_absorbing_markov",
    "q305_term_burstiness",
    "q306_population_estimates",
    "q307_dup_rate_by_source",
    "q308_runs_test",
    "q309_effective_sample_size",
    "q310_holm_correction",
]

# Superseded round-2 rotation, kept for the audit trail.
_ADJUDICATED_R2 = [
    "q90_int8_quantization",
    "q86_repetition_signals",
    "q87_contamination_screen",
    "q88_mixture_weights",
    "q89_passage_overlap",
    "q85_incremental_dedup",
    "q47_winnowing_fingerprints",
    "q49_bpe_token_segmentation",
    "q72_frame_sample",
    "q57_interval_join",
    "q58_kmv_distinct",
    "q59_grouped_agg_udaf",
    "q73_dataset_split",
    "q74_sequence_packing",
    "q75_bm25_scoring",
    "q78_zorder_curve",
    "q79_rolling_median",
    "q80_ohlc_resample",
    "q81_series_gaps",
    "q82_quality_fence_filter",
    "q83_doc_chunking",
    "q84_label_centroids",
    "q76_stratified_cap",
    "q77_pii_content_filter",
    "q48_dedup_clusters",
    "q56_ivf_ann",
    "q51_embedding_near_dup",
    "q52_bucketed_ann",
    "q40_token_stats",
    "q41_lang_id",
    "q42_quality_score",
    "q43_fingerprint_dedup",
    "q53_knn_label_vote",
    "q54_array_functions",
    "q55_kmeans_clusters",
    "q60_json_extract",
    "q61_tumbling_window",
    "q62_sliding_window",
    "q63_sessionization",
    "q63b_native_session_window",
    "q64_ladder_explode",
    "q65_order_book_wire",
]


def _ordered(names: list[str]) -> list[str]:
    first = [n for n in _ADJUDICATE_FIRST if n in names]
    rest = [n for n in names if n not in _ADJUDICATE_FIRST]
    return first + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: registry.QUERIES[n] for n in _ordered(list(registry.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {n: registry.ORACLES[n] for n in _ordered(list(registry.ORACLES))}
