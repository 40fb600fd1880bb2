"""Round-5 finance-query semantics cross-checked against INDEPENDENT
pandas formulations (the test_indicators_pandas law: oracle parity
proves Spark == DuckDB; this proves the formulas are the standard
definitions, via pandas' own rolling/sampling machinery)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crypto_prediction_etl_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="module")
def candles_pdf(spark, sf_dir):
    from crypto_prediction_etl_spark.plans.indicators_q import candles

    return (
        candles(spark, sf_dir)
        .filter("id = '1-URGENT'")
        .orderBy("dt")
        .toPandas()
    )


def test_rv_signature_matches_pandas(spark, sf_dir, candles_pdf):
    out = (
        registry.QUERIES["q352_rv_signature"](spark, sf_dir)
        .filter("id = '1-URGENT'")
        .toPandas()
        .set_index("stride")
    )
    close = candles_pdf["close"].reset_index(drop=True)
    for k in (1, 2, 5, 10):
        sampled = close.iloc[::k].reset_index(drop=True)
        rets = np.log(sampled / sampled.shift(1)).dropna()
        rv = float((rets**2).sum())
        assert out.loc[k, "n_rets"] == len(rets)
        assert abs(out.loc[k, "rv"] - rv) < 1e-5
        assert abs(out.loc[k, "var_per_bar"] - rv / len(rets)) < 1e-8


def _tick_series(close: pd.Series) -> pd.Series:
    raw = np.sign(close.diff())
    raw[raw == 0] = np.nan
    return raw.ffill()


def test_sign_autocorr_matches_pandas(spark, sf_dir, candles_pdf):
    out = (
        registry.QUERIES["q353_sign_autocorr"](spark, sf_dir)
        .filter("id = '1-URGENT'")
        .toPandas()
        .set_index("lag")
    )
    tick = _tick_series(candles_pdf["close"]).dropna().reset_index(drop=True)
    for lag in (1, 2, 3, 4, 5):
        a, b = tick.iloc[lag:].reset_index(drop=True), tick.iloc[:-lag].reset_index(drop=True)
        rho = float(np.corrcoef(a, b)[0, 1])
        assert out.loc[lag, "n"] == len(a)
        assert abs(out.loc[lag, "rho"] - rho) < 1e-5


def test_semivariance_matches_pandas(spark, sf_dir, candles_pdf):
    out = (
        registry.QUERIES["q354_semivariance"](spark, sf_dir)
        .filter("id = '1-URGENT'")
        .orderBy("dt")
        .toPandas()
    )
    rets = np.log(candles_pdf["close"] / candles_pdf["close"].shift(1)).dropna()
    dsq = rets.where(rets < 0, 0.0) ** 2 * (rets < 0)
    usq = rets.where(rets > 0, 0.0) ** 2 * (rets > 0)
    rs_down = dsq.rolling(20).sum().dropna().reset_index(drop=True)
    rs_up = usq.rolling(20).sum().dropna().reset_index(drop=True)
    assert len(out) == len(rs_down)
    assert np.allclose(out["rs_down"], rs_down, atol=1e-7)
    assert np.allclose(out["rs_up"], rs_up, atol=1e-7)
    assert np.allclose(
        out["signed_jump"], (rs_up - rs_down), atol=1e-7
    )


def test_bh_fdr_monotonicity(spark, sf_dir):
    """BH invariants: ranks are a permutation, critical values are
    decreasing in rank, and the significant set is a prefix of the
    rank order (step-up property)."""
    out = (
        registry.QUERIES["q355_bh_fdr"](spark, sf_dir)
        .orderBy("bh_rank")
        .toPandas()
    )
    assert list(out["bh_rank"]) == list(range(1, len(out) + 1))
    assert (out["z_crit"].diff().dropna() <= 0).all()
    sig = list(out["significant"])
    assert sig == sorted(sig, reverse=True)
