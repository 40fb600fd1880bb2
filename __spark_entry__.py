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
# round.  Rotation for round 7 (VERDICT r6 item 1): drain the oldest
# never-adjudicated tail in numeric order — q285-q334 (catalog frozen
# at 420; 136 never-adjudicated entering r7, 86 remain for r8/r9).
# Everything already adjudicated keeps its green row and stays covered
# by the local mirror (tests/test_oracle_parity.py +
# tools/driver_replay.py, which canonicalizes through pandas exactly
# like the driver) plus the independent numpy/pandas cross-checks in
# tests/test_r6_tail_pandas.py.
_ADJUDICATE_FIRST = [
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
    "q311_map_functions",
    "q312_garch_filter",
    "q313_range_volatility",
    "q314_kcore_decomposition",
    "q315_poisson_bootstrap",
    "q316_js_divergence",
    "q317_volatility_cones",
    "q318_ljung_box",
    "q319_rolling_moments",
    "q320_hashed_linear_classifier",
    "q321_asof_tolerance",
    "q322_point_in_time_features",
    "q323_purged_labels",
    "q324_portfolio_var_es",
    "q325_tail_dependence",
    "q326_seasonality_anova",
    "q327_mde_planner",
    "q328_soft_dedup_weights",
    "q329_rolling_uniques_exact",
    "q330_diff_in_diff",
    "q331_kyle_lambda",
    "q332_hawkes_intensity",
    "q333_woe_iv_binning",
    "q334_threshold_sweep",
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
