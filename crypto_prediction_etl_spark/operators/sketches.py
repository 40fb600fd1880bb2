"""Deterministic cardinality sketches.

Spark's approx_count_distinct (HLL++) and DuckDB's approx_count_distinct
are different sketches with different RNG — their estimates can never
hash-match across engines. KMV (k-minimum-values) over the portable
md5 hash CAN: the estimator is a pure function of the k-th smallest
hash value, both engines compute identical hashes, so the "approximate"
result is bit-for-bit reproducible anywhere — the property that matters
when a 100 TB pipeline's QA diff must not flag sketch noise.

Estimator (Bar-Yossef et al.): with hashes uniform on [0, 2^60), the
k-th smallest distinct hash h_k estimates cardinality as
(k-1) * 2^60 / h_k. Groups with fewer than k distinct values are exact
by construction (the sketch holds them all).

Scale shape: one distinct-shuffle on (group, hash) then a per-group
top-k window over at most k retained rows per group — at 100 TB the
retained state per group is k longs, the same bound a production HLL
register bank gives, with none of the merge-order sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.portable import hash64, prnd

HASH_SPACE = float(1 << 60)  # hash64 range is [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 16,
    round_to: int = 2,
) -> DataFrame:
    """(group, n_exact, kmv_estimate): KMV estimate next to the exact
    distinct count (the test oracle a pipeline QA job would keep)."""
    h = df.select(
        F.col(group_col), hash64(F.col(value_col)).alias("_h")
    ).distinct()
    w = W.partitionBy(group_col).orderBy("_h")
    r = h.select(
        F.col(group_col),
        F.col("_h"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(W.partitionBy(group_col)).alias("_nd"),
    )
    kth = r.filter(
        F.col("_rn") == F.least(F.lit(k), F.col("_nd"))
    )
    est = F.when(
        F.col("_nd") >= k,
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_h").cast("double"),
    ).otherwise(F.col("_nd").cast("double"))
    return kth.select(
        F.col(group_col),
        F.col("_nd").cast("long").alias("n_exact"),
        prnd(est, round_to).alias("kmv_estimate"),
    )
