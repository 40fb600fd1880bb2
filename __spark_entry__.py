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
# round.  Rotation for round 5 (VERDICT r4 items 2-3): the two r4
# failures lead the window so the driver re-verdicts them after their
# canonicalization fixes (q154: oracle windowed sum CAST to BIGINT so
# pandas no longer floats the HUGEINT; q157: ids_head emitted as a
# joined string on both sides so the driver's frame sort can't throw
# on a list column), followed by the 48 oldest never-adjudicated
# names in numeric order (q187-q234, which includes the fixed q200).
# The remaining never-adjudicated tail (q235+, q311+) follows in
# numeric order for the r6/r7 windows; everything else keeps its
# r1-r4 green row and stays covered by the local mirror
# (tests/test_oracle_parity.py + tools/driver_replay.py, which as of
# r5 canonicalizes through pandas exactly like the driver).
_ADJUDICATE_FIRST = [
    "q154_systematic_sample",
    "q157_token_ids",
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
