"""Window-stats mart queries (SURVEY §2.5 W1-W3, M1 end-to-end slice).

The flagship plan touches scan -> aggregate -> calendar spine (sequence/
explode) -> scalar-bounded spine -> per-id left join -> window avg ->
lag ROC -> range union: every construct of the reference's
`crypto_daily_close_stats` dbt model in one Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.rolling import daily_close_stats, daily_close_stats_sql
from ..operators.timeseries import (
    CANDLES_EVENTS_SQL,
    densify,
    densify_sql,
    events_candles,
)
from ..functions.portable import prnd
from .registry import query


@query(
    "q25_daily_close_stats",
    oracle=daily_close_stats_sql(densify_sql(CANDLES_EVENTS_SQL)),
)
def q25_daily_close_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's incremental window mart, Spark-native.

    reference: crypto_daily_close_stats.sql:22-187 (W1 rolling mean,
    W2 lag ROC, W3 range-stamped UNION ALL, J2 calendar left join,
    J3 scalar-subquery bounds) over the events-derived candle series.
    """
    return daily_close_stats(densify(events_candles(spark, sf_dir)))


@query(
    "q26_calendar_spine",
    oracle="""
    WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx
                    FROM events)
    SELECT CAST(gs.generate_series AS DATE) AS date_day
    FROM generate_series(DATE '1990-01-01', DATE '2030-12-31', INTERVAL 1 DAY) gs, bounds
    WHERE CAST(gs.generate_series AS DATE) BETWEEN bounds.mn AND bounds.mx
    """,
)
def q26_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine via sequence+explode (reference: dbt date_spine,
    calendar.sql:3-8) bounded by the data's min/max (J3)."""
    from ..operators.timeseries import calendar_spine
    from ..sources.readers import table

    ev = table(spark, sf_dir, "events").select(F.to_date("ts").alias("dt"))
    return calendar_spine(ev)


@query(
    "q27_rolling_min_max_sum",
    oracle="""
    WITH daily AS (
      SELECT event_type AS id, CAST(ts AS DATE) AS dt,
             avg(value) AS close, sum(value) AS volume
      FROM events GROUP BY 1, 2
    )
    SELECT id, dt,
           floor((min(close) OVER w7) * 10000.0 + 0.5001) / 10000.0  AS min_close_7,
           floor((max(close) OVER w7) * 10000.0 + 0.5001) / 10000.0  AS max_close_7,
           floor((sum(volume) OVER w7) * 100.0 + 0.5001) / 100.0 AS sum_volume_7,
           count(*) OVER w7              AS n_rows_7,
           floor((sum(volume) OVER (PARTITION BY id ORDER BY dt
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5001) / 100.0
                                         AS cum_volume
    FROM daily
    WINDOW w7 AS (PARTITION BY id ORDER BY dt ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q27_rolling_min_max_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling min/max/sum/count frames + running total (W1 family;
    cumulative sum is the OBV building block, SURVEY W9)."""
    from ..operators.timeseries import events_candles

    w = W.partitionBy("id").orderBy("dt")
    w7 = w.rowsBetween(-6, 0)
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    return events_candles(spark, sf_dir).select(
        "id",
        "dt",
        prnd(F.min("close").over(w7), 4).alias("min_close_7"),
        prnd(F.max("close").over(w7), 4).alias("max_close_7"),
        prnd(F.sum("volume").over(w7), 2).alias("sum_volume_7"),
        F.count("*").over(w7).alias("n_rows_7"),
        prnd(F.sum("volume").over(wcum), 2).alias("cum_volume"),
    )


@query(
    "q28_time_range_frame",
    oracle="""
    WITH daily AS (
      SELECT event_type AS id, CAST(ts AS DATE) AS dt,
             avg(value) AS close
      FROM events GROUP BY 1, 2
    )
    SELECT id, dt,
           floor((avg(close) OVER (PARTITION BY id ORDER BY dt
                  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5001) / 10000.0
             AS avg_close_7cal,
           count(*) OVER (PARTITION BY id ORDER BY dt
                  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
             AS n_days_present
    FROM daily
    """,
)
def q28_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (trailing 7 CALENDAR days, not 7 rows) —
    the correct trailing-window semantics for sparse series, distinct
    from the reference's ROWS frames (W1). Spark: rangeBetween over an
    epoch-day ordering; DuckDB: RANGE with INTERVAL bounds."""
    from ..operators.timeseries import events_candles

    daily = events_candles(spark, sf_dir).select("id", "dt", "close")
    w = (
        W.partitionBy("id")
        .orderBy(F.unix_date("dt"))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "id",
        "dt",
        prnd(F.avg("close").over(w), 4).alias("avg_close_7cal"),
        F.count("*").over(w).alias("n_days_present"),
    )
