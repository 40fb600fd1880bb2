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
# round.  Rotation for round 6 (VERDICT r5 item 1): drain the oldest
# never-adjudicated tail in numeric order — q235-q284.  Five of the
# eight record-grain global-window rewrites (q236/q248/q257/q267/q280,
# VERDICT r5 item 2) sit inside this window, so the driver verdicts
# the globalrank-routed plans directly.  The remaining tail (q285+)
# follows in numeric order for the r7/r8 windows; everything already
# adjudicated keeps its green row and stays covered by the local
# mirror (tests/test_oracle_parity.py + tools/driver_replay.py, which
# canonicalizes through pandas exactly like the driver).
_ADJUDICATE_FIRST = [
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
