"""Data-quality assertion utilities (SURVEY §5 — the reference enforces
correctness operationally; these are its checks as engine primitives).

Each check returns a small result record instead of raising, so a
pipeline driver can decide warn-vs-fail (the reference does exactly
that around market calendars: cassandra_operation.py:23-69).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    detail: str


def check_unique(df: DataFrame, cols: list[str]) -> CheckResult:
    """Uniqueness of a key combination (reference: dbt
    unique_combination_of_columns, models.yml:4-10)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    return CheckResult(
        "unique:" + ",".join(cols),
        not dup,
        f"first duplicate key: {dup[0].asDict() if dup else None}",
    )


def check_freshness(
    df: DataFrame, dt_col: str, sentinel_filter: Column, expected_dt
) -> CheckResult:
    """Sentinel-row freshness probe (reference:
    cassandra_operation.py:46-50 — previous-day row must exist for
    BTC_USDT/^NDX)."""
    n = df.filter(sentinel_filter & (F.col(dt_col) == F.lit(expected_dt))).count()
    return CheckResult("freshness", n > 0, f"rows at {expected_dt}: {n}")


def check_deletion(df: DataFrame, predicate: Column) -> CheckResult:
    """Post-delete emptiness (reference:
    trino/D_Load_crypto_candles_day_002.sql:1-6)."""
    n = df.filter(predicate).count()
    return CheckResult("deletion", n == 0, f"matching rows: {n}")


def check_row_count_parity(a: DataFrame, b: DataFrame, rel_tol: float = 0.0) -> CheckResult:
    """Row-count parity between two tables (reference:
    cross_use_test.sql count model)."""
    na, nb = a.count(), b.count()
    ok = na == nb if rel_tol == 0 else abs(na - nb) <= rel_tol * max(na, nb)
    return CheckResult("row_count_parity", ok, f"{na} vs {nb}")


def check_not_null(df: DataFrame, cols: list[str]) -> CheckResult:
    """No-null guard on required columns (reference drops None rows on
    ingest: yahoofinancials_operation.py:57)."""
    conds = [F.col(c).isNull() for c in cols]
    pred = conds[0]
    for c in conds[1:]:
        pred = pred | c
    n = df.filter(pred).count()
    return CheckResult("not_null:" + ",".join(cols), n == 0, f"null rows: {n}")


def check_offset_lag(progress: dict, max_lag: int = 1000) -> CheckResult:
    """Streaming offset-lag alarm from a progress summary (reference:
    check_offset_diff.py:20,48-69 — ALLOWED_OFFSET_DIFF=1000)."""
    lag = 0
    for s in progress.get("sources", []):
        try:
            end = int(s.get("endOffset") or 0)
            start = int(s.get("startOffset") or 0)
            lag = max(lag, end - start)
        except (TypeError, ValueError):
            continue
    return CheckResult("offset_lag", lag <= max_lag, f"max lag: {lag}")
