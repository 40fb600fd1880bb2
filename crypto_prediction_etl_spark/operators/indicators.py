"""Technical-indicator engine (SURVEY §2.5 W4-W13).

The reference computes ~26 indicator columns per symbol/day by collecting
each symbol to the driver and calling the C#-backed `stock_indicators`
library row-recursively (reference:
airflow/etl_scripts/pyspark/D_Create_crypto_ind_day_001.py:52-197,
parameterization modules/common/calculate_market_indicators.py:29-54).

Spark-first re-expression:

- Everything frame-bounded (SMA, Bollinger, stochastic, Ichimoku, Aroon,
  OBV, ROC) is a plain window expression — JVM-side, whole-stage
  codegen, one shuffle on (id) shared by every window.
- The genuinely recursive smoothers (EMA, MACD signal, Wilder RSI) run
  as a grouped-map pandas kernel (`groupBy("id").applyInPandas`) — the
  idiomatic replacement for the reference's driver loop: same math, but
  executed in parallel per symbol on executors via Arrow batches.

Seeding conventions (pinned, matching stock_indicators):
- SMA_n / Bollinger / stochastic / Aroon / Ichimoku midpoints: defined
  only once n rows exist (null before).
- EMA_n: seeded with SMA of the first n values at row n; recursive
  ``ema_t = alpha*x_t + (1-alpha)*ema_{t-1}`` after (alpha = 2/(n+1)).
- MACD(12,26,9): macd = ema12 - ema26 (from row 26); signal = EMA_9 of
  the macd series, SMA-seeded over its first 9 values (from row 34).
- RSI(14): Wilder — first average gain/loss = SMA of the first 14
  deltas (row 15); then ``avg = (prev*13 + cur)/14``; RSI=100 when the
  average loss is zero.

At scale: one hash shuffle on id; skewed symbols are bounded because
every kernel is O(rows-per-symbol); the pandas kernel streams per-group
Arrow batches, never the whole table.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Window-expressible indicators
# ---------------------------------------------------------------------------


def _w(order_col: str = "dt"):
    return W.partitionBy("id").orderBy(order_col)


def _guarded(expr, n: int, w):
    """Null until the window actually holds n rows (indicator warm-up)."""
    return F.when(F.count("close").over(w.rowsBetween(-(n - 1), 0)) >= n, expr)


def sma(n: int, col: str = "close"):
    w = _w()
    return _guarded(F.avg(col).over(w.rowsBetween(-(n - 1), 0)), n, w)


def bollinger(n: int = 20, k: float = 2.0):
    """(sma, upper, lower) with population stddev (stock_indicators
    convention, reference: calculate_market_indicators.py:34-36)."""
    w = _w()
    frame = w.rowsBetween(-(n - 1), 0)
    mid = _guarded(F.avg("close").over(frame), n, w)
    sd = _guarded(F.stddev_pop("close").over(frame), n, w)
    return mid, mid + k * sd, mid - k * sd


def obv():
    """On-balance volume: cumulative signed volume (reference:
    calculate_market_indicators.py:44)."""
    w = _w()
    delta = F.col("close") - F.lag("close", 1).over(w)
    signed = F.when(delta > 0, F.col("volume")).when(
        delta < 0, -F.col("volume")
    ).otherwise(F.lit(0.0))
    # first row of each id: no previous close -> contributes 0
    signed = F.coalesce(signed, F.lit(0.0))
    return F.sum(signed).over(w.rowsBetween(W.unboundedPreceding, 0))


def stochastic(n: int = 14, smooth_k: int = 3, d_periods: int = 3):
    """%K (smoothed), %D, %J (reference: calculate_market_indicators.py:40-42,
    output cols D_Create_crypto_ind_day_001.py:100-102,130-132).

    Computed compositionally: raw %K over n rows -> SMA(smooth_k) -> %D =
    SMA(d_periods) of %K -> %J = 3K - 2D. Returns exprs usable after two
    intermediate selects (see `with_indicators`).
    """
    w = _w()
    frame = w.rowsBetween(-(n - 1), 0)
    lo = F.min("low").over(frame)
    hi = F.max("high").over(frame)
    raw_k = _guarded(
        F.when(hi != lo, (F.col("close") - lo) / (hi - lo) * 100.0).otherwise(50.0),
        n,
        w,
    )
    return raw_k


def ichimoku_midpoint(n: int):
    """(max(high,n)+min(low,n))/2 — tenkan/kijun/senkou-B building block
    (reference: calculate_market_indicators.py:37-39)."""
    w = _w()
    frame = w.rowsBetween(-(n - 1), 0)
    return _guarded((F.max("high").over(frame) + F.min("low").over(frame)) / 2.0, n, w)


def aroon(n: int = 25):
    """(aroon_up, aroon_down): 100 * (n - periods-since-extreme) / n over
    the last n+1 rows; ties resolve to the most recent occurrence
    (reference: calculate_market_indicators.py:45).

    periods-since-extreme via `max_by`/`min_by` window aggregates on a
    (value, rn) struct — single pass, no self-join.
    """
    w = _w()
    frame = w.rowsBetween(-n, 0)
    rn = F.row_number().over(w)
    # struct comparison orders by high first, then rn -> latest max wins
    since_max = rn - F.expr("max_by(_aroon_rn, struct(high, _aroon_rn))").over(frame)
    since_min = rn - F.expr(
        "min_by(_aroon_rn, struct(low, -_aroon_rn))"
    ).over(frame)
    guard = F.count("close").over(frame) >= (n + 1)
    up = F.when(guard, (F.lit(n) - since_max) / F.lit(n) * 100.0)
    down = F.when(guard, (F.lit(n) - since_min) / F.lit(n) * 100.0)
    return rn, up, down


def with_window_indicators(candles: DataFrame, round_to: int = 2) -> DataFrame:
    """Add every frame-bounded indicator column to a candle frame
    (id, dt, high, low, close, volume). One shuffle on id; all windows
    share the (id, dt) sort."""
    w = _w()

    df = candles.withColumn("_aroon_rn", F.row_number().over(w))

    # stage 1: raw building blocks
    raw_k = stochastic()
    mid20, upper, lower = bollinger(20, 2.0)
    rn, aroon_up, aroon_down = aroon(25)
    df = df.select(
        "*",
        sma(5).alias("sma_5"),
        sma(10).alias("sma_10"),
        sma(30).alias("sma_30"),
        mid20.alias("bb_sma"),
        upper.alias("bb_upper"),
        lower.alias("bb_lower"),
        obv().alias("obv"),
        raw_k.alias("_raw_k"),
        ichimoku_midpoint(9).alias("tenkan_sen"),
        ichimoku_midpoint(26).alias("kijun_sen"),
        ichimoku_midpoint(52).alias("_senkou_b_raw"),
        aroon_up.alias("aroon_up"),
        aroon_down.alias("aroon_down"),
    )

    # stage 2: compositions over stage-1 columns
    k_frame = w.rowsBetween(-2, 0)
    df = df.withColumn(
        "stoch_k",
        F.when(
            F.count("_raw_k").over(k_frame) >= 3, F.avg("_raw_k").over(k_frame)
        ),
    )
    df = df.withColumn(
        "stoch_d",
        F.when(
            F.count("stoch_k").over(k_frame) >= 3, F.avg("stoch_k").over(k_frame)
        ),
    )
    df = df.withColumn("stoch_j", 3.0 * F.col("stoch_k") - 2.0 * F.col("stoch_d"))
    # senkou spans plotted 26 ahead; chikou 26 behind (SURVEY hard part 2)
    df = df.withColumn(
        "senkou_span_a",
        F.lag((F.col("tenkan_sen") + F.col("kijun_sen")) / 2.0, 26).over(w),
    )
    df = df.withColumn("senkou_span_b", F.lag("_senkou_b_raw", 26).over(w))
    df = df.withColumn("chikou_span", F.lead("close", 26).over(w))
    df = df.withColumn(
        "aroon_oscillator", F.col("aroon_up") - F.col("aroon_down")
    )
    # obv_sma: SMA(10) of OBV (reference W9 optional output)
    df = df.withColumn(
        "obv_sma",
        F.when(
            F.count("obv").over(w.rowsBetween(-9, 0)) >= 10,
            F.avg("obv").over(w.rowsBetween(-9, 0)),
        ),
    )
    return df.drop("_raw_k", "_senkou_b_raw", "_aroon_rn")


# ---------------------------------------------------------------------------
# Recursive smoothers — grouped-map pandas kernel
# ---------------------------------------------------------------------------


def _ema_sma_seed(x: pd.Series, n: int) -> pd.Series:
    """EMA with SMA seed at row n (stock_indicators convention)."""
    import numpy as np

    vals = x.to_numpy(dtype="float64")
    out = np.full(len(vals), np.nan)
    if len(vals) >= n:
        alpha = 2.0 / (n + 1.0)
        prev = vals[:n].mean()
        out[n - 1] = prev
        for i in range(n, len(vals)):
            prev = alpha * vals[i] + (1.0 - alpha) * prev
            out[i] = prev
    return pd.Series(out, index=x.index, dtype="float64")


def _wilder_rsi(close: pd.Series, n: int = 14) -> pd.Series:
    import numpy as np

    vals = close.to_numpy(dtype="float64")
    out = np.full(len(vals), np.nan)
    if len(vals) > n:
        delta = np.diff(vals)
        gv = np.clip(delta, 0.0, None)
        lv = np.clip(-delta, 0.0, None)
        avg_gain = gv[:n].mean()
        avg_loss = lv[:n].mean()

        def rsi_of(g: float, l: float) -> float:
            if l == 0.0:
                return 100.0
            return 100.0 - 100.0 / (1.0 + g / l)

        out[n] = rsi_of(avg_gain, avg_loss)
        for i in range(n + 1, len(vals)):
            avg_gain = (avg_gain * (n - 1) + gv[i - 1]) / n
            avg_loss = (avg_loss * (n - 1) + lv[i - 1]) / n
            out[i] = rsi_of(avg_gain, avg_loss)
    return pd.Series(out, index=close.index, dtype="float64")


RECURSIVE_COLS = [
    "ema_5",
    "ema_10",
    "ema_30",
    "macd",
    "macd_signal",
    "macd_histogram",
    "rsi_14",
]


def with_recursive_indicators(candles_or_ind: DataFrame) -> DataFrame:
    """Add EMA/MACD/RSI columns via one grouped-map pandas kernel.

    Replaces the reference's per-symbol driver collect loop (L1) with a
    parallel Arrow-batched kernel: each id's frame arrives as a pandas
    DataFrame sorted here by dt, the smoothers run O(rows), and Spark
    reassembles — no data touches the driver.
    """
    in_schema = candles_or_ind.schema
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
    out_schema = out_fields + ", " + ", ".join(f"{c} double" for c in RECURSIVE_COLS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        close = pdf["close"].astype("float64")
        ema12 = _ema_sma_seed(close, 12)
        ema26 = _ema_sma_seed(close, 26)
        macd = ema12 - ema26
        macd_valid = macd.dropna()
        signal = pd.Series(float("nan"), index=macd.index, dtype="float64")
        if len(macd_valid) >= 9:
            sig_vals = _ema_sma_seed(macd_valid.reset_index(drop=True), 9)
            signal.loc[macd_valid.index] = sig_vals.to_numpy()
        pdf["ema_5"] = _ema_sma_seed(close, 5)
        pdf["ema_10"] = _ema_sma_seed(close, 10)
        pdf["ema_30"] = _ema_sma_seed(close, 30)
        pdf["macd"] = macd
        pdf["macd_signal"] = signal
        pdf["macd_histogram"] = macd - signal
        pdf["rsi_14"] = _wilder_rsi(close, 14)
        return pdf

    out = candles_or_ind.groupBy("id").applyInPandas(kernel, schema=out_schema)
    # pandas NaN arrives as a double NaN, not SQL NULL — normalize so the
    # warm-up rows compare equal to SQL oracles (NULL) downstream
    for c in RECURSIVE_COLS:
        out = out.withColumn(c, F.when(~F.isnan(c), F.col(c)))
    return out


def n_multiple_rescale(candles: DataFrame, small_ids: list[str], factor: float = 1000.0) -> DataFrame:
    """W13: rescale tiny-priced ids before indicator math, keeping the
    multiplier as an output column for parity (reference:
    D_Create_crypto_ind_day_001.py:48,60-62,112 — SHIB_USDT x1000)."""
    mult = F.when(F.col("id").isin(small_ids), F.lit(factor)).otherwise(F.lit(1.0))
    out = candles.withColumn("n_multiple", mult)
    for c in ("open", "high", "low", "close"):
        if c in candles.columns:
            out = out.withColumn(c, F.col(c) * F.col("n_multiple"))
    return out


def indicator_frame(candles: DataFrame) -> DataFrame:
    """Full 27-column indicator mart frame: window indicators + recursive
    smoothers, one id-shuffle reused by both stages."""
    return with_recursive_indicators(with_window_indicators(candles))


# Holt's linear-trend smoothing constants, bound once so the Python
# kernel and any SQL replay use the IDENTICAL doubles (repr round-trips
# exactly; re-deriving 1-alpha in another engine could round once more).
HOLT_ALPHA = 0.2
HOLT_BETA = 0.1
HOLT_OMA = 1.0 - HOLT_ALPHA
HOLT_OMB = 1.0 - HOLT_BETA


def holt_linear(candles: DataFrame) -> DataFrame:
    """Holt's double exponential smoothing (level + trend) per id —
    the forecasting-grade smoother one step up from EMA: level_t =
    a*x_t + (1-a)*(level+trend), trend_t = b*(level_t - level_prev) +
    (1-b)*trend, initialized level_1 = x_1, trend_1 = 0. Emits the
    smoothed level, the trend, and the one-step-ahead forecast
    (level + trend).

    Same execution shape as the EMA/MACD/RSI family: one grouped-map
    pandas kernel (Arrow batch per id, O(rows) Python loop), one
    id-shuffle, no driver collect. The recursion is sequential by
    nature — per-key kernels ARE the scale-out (symbols partition the
    work); the DuckDB oracle replays it as a recursive CTE with the
    exact same float op sequence, so the gate hash-checks a recursive
    stateful operator."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = (
        out_fields + ", holt_level double, holt_trend double, holt_forecast double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        n = len(x)
        level = [0.0] * n
        trend = [0.0] * n
        if n:
            lvl, tr = float(x[0]), 0.0
            level[0], trend[0] = lvl, tr
            for t in range(1, n):
                new_l = HOLT_ALPHA * float(x[t]) + HOLT_OMA * (lvl + tr)
                tr = HOLT_BETA * (new_l - lvl) + HOLT_OMB * tr
                lvl = new_l
                level[t], trend[t] = lvl, tr
        pdf["holt_level"] = pd.Series(level, dtype="float64")
        pdf["holt_trend"] = pd.Series(trend, dtype="float64")
        pdf["holt_forecast"] = pdf["holt_level"] + pdf["holt_trend"]
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


def heikin_ashi(candles: DataFrame) -> DataFrame:
    """Heikin-Ashi smoothed candles per id: ha_close = (o+h+l+c)/4
    (rowwise), ha_open_t = (ha_open_{t-1} + ha_close_{t-1})/2 seeded
    with (open_1+close_1)/2, ha_high/ha_low = extremes over the raw
    high/low and the synthetic open/close.  The open recursion makes
    this a genuinely stateful per-key scan (like Holt/EMA), so it runs
    as the same grouped-map pandas kernel shape: one id-shuffle, an
    O(rows) Python loop per key, no driver collect.  Expects an
    ``open`` column (for the daily series it derives as the prior
    close); the DuckDB oracle replays the recursion as a recursive CTE
    with the identical float op sequence."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = (
        out_fields
        + ", ha_open double, ha_high double, ha_low double, ha_close double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        o = pdf["open"].astype("float64").to_numpy()
        h = pdf["high"].astype("float64").to_numpy()
        lo = pdf["low"].astype("float64").to_numpy()
        c = pdf["close"].astype("float64").to_numpy()
        n = len(c)
        ha_o = [0.0] * n
        ha_c = [0.0] * n
        for t in range(n):
            ha_c[t] = (
                float(o[t]) + float(h[t]) + float(lo[t]) + float(c[t])
            ) / 4.0
            if t == 0:
                ha_o[t] = (float(o[0]) + float(c[0])) / 2.0
            else:
                ha_o[t] = (ha_o[t - 1] + ha_c[t - 1]) / 2.0
        pdf["ha_open"] = pd.Series(ha_o, dtype="float64")
        pdf["ha_close"] = pd.Series(ha_c, dtype="float64")
        pdf["ha_high"] = pd.concat(
            [pdf["high"], pdf["ha_open"], pdf["ha_close"]], axis=1
        ).max(axis=1)
        pdf["ha_low"] = pd.concat(
            [pdf["low"], pdf["ha_open"], pdf["ha_close"]], axis=1
        ).min(axis=1)
        return pdf[
            [f.name for f in in_schema]
            + ["ha_open", "ha_high", "ha_low", "ha_close"]
        ]

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


ADX_N = 14


def adx(candles: DataFrame, n: int = ADX_N) -> DataFrame:
    """Wilder's Average Directional Index (ADX-14) per id: true range
    and +/- directional movement per bar, Wilder-smoothed (sum/14 seed
    then (prev*13 + x)/14), +DI/-DI ratios, DX, and ADX as a second
    Wilder smoothing of DX (seeded with the mean of the first 14 DX
    values). Two chained recursions — the deepest stateful operator in
    the family (reference family: calculate_market_indicators.py).

    Same execution shape as EMA/Holt/Heikin-Ashi: one grouped-map
    pandas kernel per id (one id-shuffle, O(rows) sequential state
    machine per key — symbols are the parallelism); every float op is
    written in the exact sequence the DuckDB recursive-CTE oracle
    replays, so state stays bit-identical across engines."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = (
        out_fields
        + ", atr double, plus_di double, minus_di double, adx double"
    )
    nf = float(n)
    nm1 = float(n - 1)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        h = pdf["high"].astype("float64").to_numpy()
        lo = pdf["low"].astype("float64").to_numpy()
        c = pdf["close"].astype("float64").to_numpy()
        m = len(c)
        nan = float("nan")
        atr_o = [nan] * m
        dip_o = [nan] * m
        dim_o = [nan] * m
        adx_o = [nan] * m
        trsum = pdmsum = mdmsum = 0.0
        atr_s = pdm14 = mdm14 = adx_s = None
        dxcum = 0.0
        for t in range(1, m):
            tr = max(
                float(h[t]) - float(lo[t]),
                abs(float(h[t]) - float(c[t - 1])),
                abs(float(lo[t]) - float(c[t - 1])),
            )
            up = float(h[t]) - float(h[t - 1])
            dn = float(lo[t - 1]) - float(lo[t])
            pdm = up if (up > dn and up > 0.0) else 0.0
            mdm = dn if (dn > up and dn > 0.0) else 0.0
            rn = t  # 1-based count of bars with a previous bar
            if rn < n:
                trsum += tr
                pdmsum += pdm
                mdmsum += mdm
                continue
            if rn == n:
                trsum += tr
                pdmsum += pdm
                mdmsum += mdm
                atr_s = trsum / nf
                pdm14 = pdmsum / nf
                mdm14 = mdmsum / nf
            else:
                atr_s = (atr_s * nm1 + tr) / nf
                pdm14 = (pdm14 * nm1 + pdm) / nf
                mdm14 = (mdm14 * nm1 + mdm) / nf
            dip = 100.0 * pdm14 / atr_s if atr_s > 0.0 else 0.0
            dim = 100.0 * mdm14 / atr_s if atr_s > 0.0 else 0.0
            s = dip + dim
            dx = 100.0 * abs(dip - dim) / s if s > 0.0 else 0.0
            if rn < 2 * n - 1:
                dxcum += dx
            elif rn == 2 * n - 1:
                dxcum += dx
                adx_s = dxcum / nf
            else:
                adx_s = (adx_s * nm1 + dx) / nf
            atr_o[t] = atr_s
            dip_o[t] = dip
            dim_o[t] = dim
            if adx_s is not None:
                adx_o[t] = adx_s
        pdf["atr"] = pd.Series(atr_o, dtype="float64")
        pdf["plus_di"] = pd.Series(dip_o, dtype="float64")
        pdf["minus_di"] = pd.Series(dim_o, dtype="float64")
        pdf["adx"] = pd.Series(adx_o, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


TRIX_N = 15
TRIX_ALPHA = 2.0 / (TRIX_N + 1.0)
TRIX_OMA = 1.0 - TRIX_ALPHA


def trix(candles: DataFrame, n: int = TRIX_N) -> DataFrame:
    """TRIX(15): 1-bar rate of change of a TRIPLE-smoothed EMA of
    close. Each EMA level uses the family's SMA-seed convention
    (q37/W5): level k seeds with the mean of the first 15 values of
    level k-1, then e = alpha*x + (1-alpha)*e. Three chained
    recursions; trix_t = 100*(e3_t/e3_{t-1} - 1).

    Grouped-map pandas kernel (one id-shuffle, O(rows) per key); seeds
    accumulate SEQUENTIALLY (plain running sum, not np.mean) so the
    DuckDB recursive-CTE oracle replays bit-identical IEEE ops."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = out_fields + ", ema3 double, trix double"
    nf = float(n)
    a, oma = TRIX_ALPHA, TRIX_OMA

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        m = len(x)
        nan = float("nan")
        e3_o = [nan] * m
        trix_o = [nan] * m
        s1 = s2 = s3 = 0.0
        e1 = e2 = e3 = None
        for t in range(m):
            rn = t + 1
            v = float(x[t])
            if rn < n:
                s1 += v
                continue
            if rn == n:
                s1 += v
                e1 = s1 / nf
            else:
                e1 = a * v + oma * e1
            k2 = rn - (n - 1)  # 1-based index into the e1 stream
            if k2 < n:
                s2 += e1
                continue
            if k2 == n:
                s2 += e1
                e2 = s2 / nf
            else:
                e2 = a * e1 + oma * e2
            k3 = k2 - (n - 1)
            if k3 < n:
                s3 += e2
                continue
            prev_e3 = e3
            if k3 == n:
                s3 += e2
                e3 = s3 / nf
            else:
                e3 = a * e2 + oma * e3
            e3_o[t] = e3
            if prev_e3 is not None:
                trix_o[t] = 100.0 * (e3 / prev_e3 - 1.0)
        pdf["ema3"] = pd.Series(e3_o, dtype="float64")
        pdf["trix"] = pd.Series(trix_o, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


KALMAN_Q = 10.0
KALMAN_R = 1000.0
KALMAN_P0 = 1.0e6


def kalman_level(candles: DataFrame) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter per id:
    predict p += Q, gain K = p/(p+R), update level += K*(x - level),
    p *= (1-K). Level seeds at the first observation with a diffuse
    p0, so the gain starts ~1 (trust data) and anneals to the steady
    state. Grouped-map pandas kernel; every float op in the exact
    order the recursive-CTE oracle replays."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = out_fields + ", kalman_level double, kalman_gain double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        m = len(x)
        nan = float("nan")
        lvl_o = [nan] * m
        gain_o = [nan] * m
        if m:
            level = float(x[0])
            p = KALMAN_P0
            for t in range(1, m):
                pp = p + KALMAN_Q
                k = pp / (pp + KALMAN_R)
                level = level + k * (float(x[t]) - level)
                p = (1.0 - k) * pp
                lvl_o[t] = level
                gain_o[t] = k
        pdf["kalman_level"] = pd.Series(lvl_o, dtype="float64")
        pdf["kalman_gain"] = pd.Series(gain_o, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


EWMA_LAMBDA = 0.94  # RiskMetrics decay for daily returns


def ewma_volatility(candles: DataFrame, lam: float = EWMA_LAMBDA) -> DataFrame:
    """RiskMetrics exponentially-weighted volatility per id:
    v_t = lam * v_{t-1} + (1-lam) * r_t^2 over daily log returns,
    seeded v_1 = r_1^2; emitted as the annualized sigma
    sqrt(v_t * 365). The industry-standard (J.P. Morgan RiskMetrics
    1996) conditional-volatility estimator: variance itself is the
    recursive EMA state, which no window aggregate expresses.

    Same grouped-map pandas kernel law as EMA/Holt/Kalman (one
    id-shuffle, O(rows) sequential state per key; symbols are the
    parallelism). Rows before the second observation carry no return
    and are dropped by the caller."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = out_fields + ", ret double, ewma_var double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        n = len(x)
        ret = np.full(n, np.nan)
        var = np.full(n, np.nan)
        v = np.nan
        for t in range(1, n):
            r = math.log(float(x[t]) / float(x[t - 1]))
            ret[t] = r
            v = r * r if t == 1 else lam * v + (1.0 - lam) * r * r
            var[t] = v
        pdf["ret"] = pd.Series(ret, dtype="float64")
        pdf["ewma_var"] = pd.Series(var, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD = 0.3, 0.1, 0.2, 7


def holt_winters_additive(candles: DataFrame) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per id,
    weekly period m=7: level/trend as in Holt (q100) plus a seasonal
    state vector updated one slot per step — the classical seasonal
    forecaster (Winters 1960). Init: level = mean of the first m
    closes, trend = 0, seasonals = first-m deviations from that mean;
    the recursion starts at t = m+1 and earlier rows emit NULLs.

    Same grouped-map kernel law as EMA/Holt/Kalman: one id-shuffle,
    O(rows) sequential state per key, m extra floats of state."""
    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = (
        out_fields
        + ", hw_level double, hw_trend double, hw_season double,"
        + " hw_forecast double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = HW_PERIOD
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        n = len(x)
        lvl_o = np.full(n, np.nan)
        tr_o = np.full(n, np.nan)
        se_o = np.full(n, np.nan)
        fc_o = np.full(n, np.nan)
        if n > m:
            lvl = float(np.mean(x[:m]))
            tr = 0.0
            season = [float(x[i]) - lvl for i in range(m)]
            for t in range(m, n):
                s_prev = season[0]
                fc_o[t] = lvl + tr + s_prev
                new_l = HW_ALPHA * (float(x[t]) - s_prev) + (
                    1.0 - HW_ALPHA
                ) * (lvl + tr)
                tr = HW_BETA * (new_l - lvl) + (1.0 - HW_BETA) * tr
                s_new = HW_GAMMA * (float(x[t]) - new_l) + (
                    1.0 - HW_GAMMA
                ) * s_prev
                lvl = new_l
                season = season[1:] + [s_new]
                lvl_o[t] = lvl
                tr_o[t] = tr
                se_o[t] = s_new
        pdf["hw_level"] = pd.Series(lvl_o, dtype="float64")
        pdf["hw_trend"] = pd.Series(tr_o, dtype="float64")
        pdf["hw_season"] = pd.Series(se_o, dtype="float64")
        pdf["hw_forecast"] = pd.Series(fc_o, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)


GARCH_ALPHA, GARCH_BETA = 0.08, 0.90


def garch_filter(
    candles: DataFrame, alpha: float = GARCH_ALPHA, beta: float = GARCH_BETA
) -> DataFrame:
    """GARCH(1,1) conditional-variance filtering per id with pinned
    (alpha, beta) and variance targeting: omega = (1-alpha-beta)*vbar
    where vbar is the series' mean squared log return — the
    mean-reverting generalization of q222's RiskMetrics EWMA (which is
    the omega=0, alpha+beta=1 edge case). Recursion: v_1 = vbar, then
    v_t = omega + alpha*r_{t-1}^2 + beta*v_{t-1}.

    vbar snaps to the 1e-10 portable grid before use (the q55 centroid
    trick): a float mean over an arbitrary-order aggregation differs
    across engines at ~1e-18, which the recursion would amplify — on
    the grid both engines seed from the identical double and the whole
    state trajectory stays bit-identical. Parameter estimation (MLE)
    is out of scope by design: filtering with pinned params is the
    deterministic, hash-checkable core; the estimation loop would ride
    the same kernel. Same grouped-map law as EMA/Holt/Kalman: one
    id-shuffle, O(rows) sequential state per key."""
    import math

    import numpy as np

    in_schema = candles.schema
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema
    )
    out_schema = out_fields + ", ret double, garch_var double"
    a, b = alpha, beta

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dt").reset_index(drop=True)
        x = pdf["close"].astype("float64").to_numpy()
        n = len(x)
        ret = np.full(n, np.nan)
        var = np.full(n, np.nan)
        if n > 1:
            for t in range(1, n):
                ret[t] = math.log(float(x[t]) / float(x[t - 1]))
            r = ret[1:]
            vbar = 0.0
            for v in r:  # sequential sum, then grid-snap the mean
                vbar += v * v
            vbar = math.floor(vbar / len(r) * 1e10 + 0.5001) / 1e10
            omega = (1.0 - a - b) * vbar
            v = vbar
            var[1] = v
            for t in range(2, n):
                v = omega + a * ret[t - 1] * ret[t - 1] + b * v
                var[t] = v
        pdf["ret"] = pd.Series(ret, dtype="float64")
        pdf["garch_var"] = pd.Series(var, dtype="float64")
        return pdf

    return candles.groupBy("id").applyInPandas(kernel, schema=out_schema)
