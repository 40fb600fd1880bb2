"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, and (order-insensitively) values."""

from __future__ import annotations

import math

import duckdb

from crypto_prediction_etl_spark.sources.readers import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_rows(rows):
    return sorted(
        (tuple(_norm(v) for v in row) for row in rows),
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


def compare_query(spark, sf_dir: str, name: str, rel_tol: float = 1e-6):
    """Assert Spark result == DuckDB oracle for query `name`."""
    from crypto_prediction_etl_spark.plans.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(row[c] for c in spark_cols) for row in sdf.collect()
    ]

    con = duckdb_conn(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols_all = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    order = sorted(range(len(duck_cols_all)), key=lambda i: duck_cols_all[i])
    duck_cols = [duck_cols_all[i] for i in order]
    duck_rows = [tuple(r[i] for i in order) for r in duck_rows_raw]
    con.close()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )

    s_sorted = _sorted_rows(spark_rows)
    d_sorted = _sorted_rows(duck_rows)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (sv, dv) in zip(duck_cols, zip(sr, dr)):
            if sv == dv:
                continue
            if (
                isinstance(sv, float)
                and isinstance(dv, float)
                and math.isclose(sv, dv, rel_tol=rel_tol, abs_tol=1e-9)
            ):
                continue
            mismatches.append((i, c, sv, dv))
            if len(mismatches) >= 5:
                break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches}"
