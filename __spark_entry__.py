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
# round.  Rotation for round 8 (VERDICT r7 item 1): drain the oldest
# never-adjudicated tail in numeric order — q335-q384 (catalog frozen
# at 420; 86 never-adjudicated entering r8, 36 remain for r9).
# Everything already adjudicated keeps its green row and stays covered
# by the local mirror (tests/test_oracle_parity.py +
# tools/driver_replay.py, which canonicalizes through pandas exactly
# like the driver) plus the independent numpy/pandas cross-checks in
# tests/test_r6_tail_pandas.py and tests/test_r7_hash_mirrors.py.
#
# ROUND-9 PLAN (pre-staged per VERDICT r7 item 5; verify against
# CORRECTNESS_r08 keys at r9 start): the 36 remaining never-adjudicated
# names, consecutive q385_book_walk .. q420_weekly_ks_drift:
#   q385_book_walk, q386_embedding_drift, q387_kde,
#   q388_theil_decomposition, q389_texttiling, q390_filter_bias,
#   q391_knn_assortativity, q392_data_budget, q393_geometric_median,
#   q394_rank_biased_overlap, q395_weibull_fit, q396_dead_letter_audit,
#   q397_lexical_diversity, q398_similarity_alignment,
#   q399_self_retrieval, q400_mixture_materializer,
#   q401_kingman_backpressure, q402_vnode_balance, q403_decay_trending,
#   q404_erasure_cost, q405_ledger_reconciliation, q406_greedy_coverage,
#   q407_vocab_coverage, q408_harmonic_dow, q409_rank_ic,
#   q410_shard_key_advisor, q411_cross_source_dups,
#   q412_uncertainty_sampling, q413_slo_burn_rate, q414_ecod_outliers,
#   q415_bloom_empirical, q416_group_sequential, q417_lineage_manifest,
#   q418_coverage_knee, q419_mix_shift, q420_weekly_ks_drift
# plus 14 RE-adjudication picks — queries whose PLANS changed after
# their last driver verdict, so each ends the build with a post-change
# driver verdict (oldest-verdict-first; q351_mmd_two_sample's r7 guard
# rewrite is covered by THIS r8 window):
#   q141_edit_distance_pairs (verdict r3; r8 band-composed the
#     blocking key and re-derived the oracle — the HIGHEST-priority
#     re-adjudication, its r3 verdict covers a superseded plan),
#   q267_concurrency_sweep, q280_interval_coverage (allow_ties added
#     r7, last verdict r6),
#   q75_bm25_scoring (verdict r2, globalrank-routed r6),
#   q153_curriculum_shards (verdict r4, globalrank-routed r6),
#   q154_systematic_sample (verdict r5, globalrank-routed r6),
# then fill the remaining ~8 slots with the oldest overall verdicts as
# freshness re-checks (r1 adjudicated set, numeric order):
#   q01_pricing_summary, q02_filtered_revenue, q03_distinct_keys,
#   q04_union_counts, q05_minmax_bounds, q10_region_revenue,
#   q11_top_unshipped_orders, q12_semi_anti_join
# (swap any already re-verdicted member for the next oldest at r9
# start; verify the final list against CORRECTNESS_r08 keys).
_ADJUDICATE_FIRST = [
    "q335_spearman_rho",
    "q336_triple_barrier",
    "q337_vpin",
    "q338_fracdiff",
    "q339_corwin_schultz",
    "q340_mann_whitney",
    "q341_chi_square",
    "q342_kendall_tau",
    "q343_wasserstein",
    "q344_dsir_weights",
    "q345_heaps_law",
    "q346_pacf_durbin",
    "q347_haar_energy",
    "q348_lof_outliers",
    "q349_paragraph_dedup",
    "q350_hill_tail_index",
    "q351_mmd_two_sample",
    "q352_rv_signature",
    "q353_sign_autocorr",
    "q354_semivariance",
    "q355_bh_fdr",
    "q356_tokenizer_fertility",
    "q357_ngram_novelty",
    "q358_matryoshka_audit",
    "q359_dedup_threshold_sweep",
    "q360_watermark_sweep",
    "q361_reshard_audit",
    "q362_content_screen",
    "q363_dataset_card",
    "q364_variance_ratio",
    "q365_adamic_adar",
    "q366_readability",
    "q367_span_dedup",
    "q368_cka_alignment",
    "q369_rake_keyphrases",
    "q370_fd_violations",
    "q371_bloom_sizing",
    "q372_label_modularity",
    "q373_kneser_ney",
    "q374_sax_motifs",
    "q375_quantile_effects",
    "q376_burrows_delta",
    "q377_fd_binwidth",
    "q378_ccnet_buckets",
    "q379_self_bleu",
    "q380_hubness_audit",
    "q381_epps_effect",
    "q382_log_odds_keyness",
    "q383_ips_offpolicy",
    "q384_conformal_coverage",
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
