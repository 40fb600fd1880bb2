"""Pipeline driver: the reference's orchestrated flows without Airflow
(SURVEY M5 / §2.11 L1-L5).

The reference sequences [delete window -> verify deletion -> federated
insert -> compute indicators per symbol via driver loop -> write wrk ->
delete prod -> promote wrk -> truncate wrk] across Airflow/Trino/Spark
(D_Load_crypto_candles_day.py:128-138, D_Create_indicator_day.py:374-382).

Here the whole flow is one Spark lineage + one dynamic-partition
overwrite: compute the indicator frame over the lookback window, filter
to the update window, overwrite exactly those partitions. The wrk
staging twin disappears (SURVEY L4: "wrk layer collapses"); idempotence
comes from partition overwrite, not delete sweeps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.indicators import (
    indicator_frame,
    n_multiple_rescale,
)
from ..quality.checks import CheckResult, check_not_null, check_unique
from ..sources.writers import add_partition_cols, reload_window


@dataclass
class PipelineReport:
    rows_written: int
    checks: list[CheckResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(c.passed for c in self.checks)


def run_indicator_mart(
    spark: SparkSession,
    candles: DataFrame,
    mart_path: str,
    *,
    lookback_days: int | None = None,
    update_days: int | None = None,
    small_ids: list[str] | None = None,
) -> PipelineReport:
    """Candles -> full indicator mart, idempotent window reload.

    - ``lookback_days``: indicator computation window (reference: 3
      months, D_Create_indicator_day.py:87) — indicators near the window
      start warm up exactly as the reference's bounded scan does.
    - ``update_days``: trailing window actually (re)written (reference:
      1 month, :90).
    - ``small_ids``: W13 N_multiple rescale targets.
    """
    max_dt = candles.agg(F.max("dt").alias("mx"))
    if lookback_days is not None:
        candles = candles.join(F.broadcast(max_dt)).filter(
            F.col("dt") >= F.date_sub(F.col("mx"), lookback_days)
        ).drop("mx")
    if small_ids:
        candles = n_multiple_rescale(candles, small_ids)
    else:
        candles = candles.withColumn("n_multiple", F.lit(1.0))

    ind = indicator_frame(candles)
    if update_days is not None:
        ind = ind.join(F.broadcast(max_dt)).filter(
            F.col("dt") >= F.date_sub(F.col("mx"), update_days)
        ).drop("mx")

    out = add_partition_cols(
        ind.withColumn("ts_create_utc", F.col("dt").cast("timestamp"))
    )
    reload_window(out, mart_path)

    written = spark.read.parquet(mart_path)
    checks = [
        check_unique(written, ["id", "dt"]),
        check_not_null(written, ["id", "dt", "close"]),
    ]
    return PipelineReport(rows_written=written.count(), checks=checks)
