"""As-of join — a temporal operator Spark lacks natively (SURVEY §7.2
custom-operator path (a): composition of existing DataFrame ops).

``asof_join(left, right, on, by)``: for every left row, attach the
most recent right row with ``right.on <= left.on`` within the same
``by`` group — the standard point-in-time enrichment (trade -> latest
quote, event -> latest candle).

Spark-first formulation (no per-group pandas, no range explosion):
union the two sides tagged by origin, sort one window per ``by`` key
over the time column, and carry the right side's payload forward with
``last(..., ignorenulls=True)`` — an O(n log n) single-shuffle plan
that scales with the union size, not left x right.

Ordering within equal timestamps puts the right row FIRST so a left
row at exactly t matches the right row at t (inclusive semantics,
matching DuckDB's ASOF JOIN and pandas merge_asof defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row + latest right payload at or
    before its ``on`` time, per ``by`` key.

    ``value_cols``: right-side payload columns to attach (default: all
    non-key columns of ``right``).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    lhs = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal _t => inclusive match
    w = (
        W.partitionBy("_by")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "_is_left",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rf_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_is_left") == 1)
    return filled.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rf_{c}").alias(f"right_{c}") for c in value_cols],
    )
