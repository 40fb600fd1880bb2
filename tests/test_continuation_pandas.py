"""Continuation-batch (q364+) semantics cross-checked against
INDEPENDENT numpy/pandas formulations — oracle parity proves
Spark == DuckDB; these prove the formulas are the standard
definitions, using numpy's own linear algebra / pandas' resampling
machinery rather than the query's arithmetic."""

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


def test_variance_ratio_matches_numpy(spark, sf_dir, candles_pdf):
    out = (
        registry.QUERIES["q364_variance_ratio"](spark, sf_dir)
        .filter("id = '1-URGENT'")
        .toPandas()
        .iloc[0]
    )
    close = candles_pdf["close"].to_numpy()
    r1 = np.diff(np.log(close))
    assert out["n_obs"] == len(r1)
    for k in (2, 4, 8):
        rk = np.log(close[k:]) - np.log(close[:-k])
        vr = rk.var() / (k * r1.var())  # numpy var = population
        assert abs(out[f"vr_{k}"] - vr) < 1e-5
        z = (vr - 1) / np.sqrt(
            2 * (2 * k - 1) * (k - 1) / (3 * k * len(r1))
        )
        assert abs(out[f"z_{k}"] - z) < 1e-3


def test_harmonic_dow_matches_lstsq(spark, sf_dir):
    from crypto_prediction_etl_spark.plans.indicators_q import candles

    pdf = (
        candles(spark, sf_dir)
        .filter("id = '1-URGENT'")
        .orderBy("dt")
        .toPandas()
    )
    out = (
        registry.QUERIES["q408_harmonic_dow"](spark, sf_dir)
        .filter("id = '1-URGENT'")
        .toPandas()
        .iloc[0]
    )
    y = (pdf["volume_cents"].astype(float) / 100.0).to_numpy()
    dow = pd.to_datetime(pdf["dt"]).dt.dayofweek.to_numpy()
    # pandas dayofweek: Monday=0; the query uses Sunday=0 — convert
    dow_sun0 = (dow + 1) % 7
    X = np.column_stack(
        [
            np.ones_like(y),
            np.cos(2 * np.pi * dow_sun0 / 7),
            np.sin(2 * np.pi * dow_sun0 / 7),
        ]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    _, a, b = beta
    assert abs(out["amplitude"] - np.hypot(a, b)) < 0.05
    fitted = [
        a * np.cos(2 * np.pi * d / 7) + b * np.sin(2 * np.pi * d / 7)
        for d in range(7)
    ]
    assert out["peak_dow"] == int(np.argmax(fitted))
    resid = y - X @ beta
    r2 = 1 - resid.var() / y.var()
    assert abs(out["r_squared"] - r2) < 1e-3


def test_epps_matches_pandas_resample(spark, sf_dir):
    from crypto_prediction_etl_spark.plans.indicators_q import candles

    pdf = candles(spark, sf_dir).orderBy("id", "dt").toPandas()
    out = registry.QUERIES["q381_epps_effect"](spark, sf_dir).toPandas()
    ids = sorted(pdf["id"].unique())[:2]
    a, b = ids[0], ids[1]
    k = 5
    epoch = pd.Timestamp("1992-01-01")

    def binned(sym):
        g = pdf[pdf["id"] == sym].copy()
        g["bin"] = (
            (pd.to_datetime(g["dt"]) - epoch).dt.days // k
        )
        last = g.sort_values("dt").groupby("bin")["close"].last()
        return np.log(last / last.shift(1)).dropna()

    ra, rb = binned(a), binned(b)
    j = pd.concat([ra, rb], axis=1, join="inner").dropna()
    j.columns = ["x", "y"]
    want = np.corrcoef(j["x"], j["y"])[0, 1]
    row = out[
        (out["id_a"] == a) & (out["id_b"] == b) & (out["k"] == k)
    ].iloc[0]
    assert row["n_obs"] == len(j)
    assert abs(row["xcorr"] - want) < 1e-4


def test_kde_matches_numpy(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'click'")
        .select("value")
        .toPandas()["value"]
        .to_numpy()
    )
    out = (
        registry.QUERIES["q387_kde"](spark, sf_dir)
        .filter("event_type = 'click'")
        .toPandas()
        .set_index("grid_x")
    )
    h = 8.0
    for g in (0.0, 50.0, 100.0):
        u = (ev - g) / h
        kvals = np.where(np.abs(u) < 1, 0.75 * (1 - u * u), 0.0)
        dens = kvals.sum() / (len(ev) * h)
        assert abs(out.loc[g, "density"] - dens) < 1e-5


def test_kneser_ney_matches_pure_python(spark, sf_dir):
    import collections

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("lang = 'en'")
        .select("text")
        .toPandas()["text"]
        .tolist()
    )
    bigrams = collections.Counter()
    for t in docs:
        toks = t.lower().split(" ")
        for v, w in zip(toks, toks[1:]):
            bigrams[(v, w)] += 1
    c_v = collections.Counter()
    n1p_fwd = collections.Counter()
    n1p_back = collections.Counter()
    for (v, w), n in bigrams.items():
        c_v[v] += n
        n1p_fwd[v] += 1
        n1p_back[w] += 1
    n_types = len(bigrams)
    d = 0.75
    total_n = sum(bigrams.values())
    nll = 0.0
    for (v, w), n in bigrams.items():
        p = max(n - d, 0.0) / c_v[v] + (d * n1p_fwd[v] / c_v[v]) * (
            n1p_back[w] / n_types
        )
        nll -= n * np.log(p)
    nll /= total_n
    out = (
        registry.QUERIES["q373_kneser_ney"](spark, sf_dir)
        .filter("lang = 'en'")
        .toPandas()
        .iloc[0]
    )
    assert out["n_bigrams"] == total_n
    assert out["n_types"] == n_types
    assert abs(out["nll"] - nll) < 1e-4
    assert abs(out["perplexity"] - np.exp(nll)) < 0.05


def test_theil_matches_numpy(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").toPandas()
    rev = (
        orders.groupby("o_custkey")["o_totalprice"].sum().rename("rev")
    )
    cn = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "n_regionkey"]]
    df = cn.merge(rev, left_on="c_custkey", right_index=True)
    y = df["rev"].to_numpy()
    share = y / y.sum()
    t_total = float((share * np.log(share * len(y))).sum())
    out = registry.QUERIES["q388_theil_decomposition"](
        spark, sf_dir
    ).toPandas()
    assert abs(out["t_total"].iloc[0] - t_total) < 1e-4


def test_conformal_coverage_near_nominal(spark, sf_dir):
    out = registry.QUERIES["q384_conformal_coverage"](
        spark, sf_dir
    ).toPandas()
    # pooled coverage should be near the 90% target (exchangeable
    # calibration/test splits); per-type it may wobble
    pooled = (out["coverage"] * out["n_test"]).sum() / out["n_test"].sum()
    assert 0.85 <= pooled <= 0.97, pooled


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    V = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
        "float64"
    )
    return pdf["vec_id"].to_numpy(), pdf["label"].to_numpy(), V


def test_cka_matches_numpy_matrices(spark, sf_dir, emb):
    _, _, V = emb
    X, Y = V[:, :16], V[:, -16:]
    Xc, Yc = X - X.mean(0), Y - Y.mean(0)
    n = len(V)
    cxy = Xc.T @ Yc / n
    cxx = Xc.T @ Xc / n
    cyy = Yc.T @ Yc / n
    want = (cxy**2).sum() / np.sqrt((cxx**2).sum() * (cyy**2).sum())
    out = registry.QUERIES["q368_cka_alignment"](spark, sf_dir).collect()[0]
    assert abs(out.cka - want) < 1e-5


def _knn_edges(V, k=10):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    np.fill_diagonal(S, -np.inf)
    edges = set()
    knn = {}
    for i in range(len(V)):
        order = sorted(
            range(len(V)), key=lambda j: (-S[i, j], j)
        )[:k]
        knn[i] = set(order)
    for i in range(len(V)):
        for j in knn[i]:
            if i < j and i in knn[j]:
                edges.add((i, j))
    return edges, knn


def test_graph_metrics_match_bruteforce(spark, sf_dir, emb):
    ids, labels, V = emb
    edges, knn = _knn_edges(V)
    # modularity
    m = len(edges)
    lab = dict(zip(range(len(V)), labels))
    internal = {}
    deg = {}
    for u, v in edges:
        deg[lab[u]] = deg.get(lab[u], 0) + 1
        deg[lab[v]] = deg.get(lab[v], 0) + 1
        if lab[u] == lab[v]:
            internal[lab[u]] = internal.get(lab[u], 0) + 1
    q_want = sum(
        internal.get(c, 0) / m - (deg.get(c, 0) / (2 * m)) ** 2
        for c in set(labels)
    )
    mod = registry.QUERIES["q372_label_modularity"](spark, sf_dir).collect()
    assert abs(mod[0].q_total - q_want) < 1e-4
    # hubness: k-occurrence counts
    nk = {i: 0 for i in range(len(V))}
    for i, nbrs in knn.items():
        for j in nbrs:
            nk[j] += 1
    vals = np.array(list(nk.values()), dtype=float)
    skew_want = ((vals - vals.mean()) ** 3).mean() / vals.var() ** 1.5
    hub = registry.QUERIES["q380_hubness_audit"](spark, sf_dir).collect()
    assert abs(hub[0].nk_skewness - skew_want) < 1e-2
    assert hub[0].max_nk == int(vals.max())
    # assortativity over directed edge instances
    dirs = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    d = {}
    for u, v in dirs:
        d[u] = d.get(u, 0) + 1
    x = np.array([d[u] for u, v in dirs], dtype=float)
    y = np.array([d[v] for u, v in dirs], dtype=float)
    r_want = np.corrcoef(x, y)[0, 1]
    a = registry.QUERIES["q391_knn_assortativity"](spark, sf_dir).collect()[0]
    assert a.n_edges == m
    assert abs(a.assortativity - r_want) < 1e-4


def test_qte_matches_np_percentile(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    m = ev.groupby("user_id")["value"].sum()
    arms = {g: m[m.index % 2 == g].to_numpy() for g in (0, 1)}
    out = (
        registry.QUERIES["q375_quantile_effects"](spark, sf_dir)
        .toPandas()
        .set_index("decile")
    )
    for d in (1, 5, 9):
        qa = np.percentile(arms[0], d * 10, method="linear")
        qb = np.percentile(arms[1], d * 10, method="linear")
        assert abs(out.loc[d, "q_a"] - qa) < 1e-3
        assert abs(out.loc[d, "q_b"] - qb) < 1e-3
        assert abs(out.loc[d, "qte"] - (qb - qa)) < 2e-3


def test_weibull_matches_numpy_lstsq(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'click'")
        .select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    gaps = []
    for _, g in ev.groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy() / 1e9
        dt = np.diff(t)
        gaps.extend(dt[dt > 0])
    t = np.sort(np.array(gaps))
    n = len(t)
    f = (np.arange(1, n + 1) - 0.3) / (n + 0.4)
    x = np.log(t)
    y = np.log(-np.log(1 - f))
    A = np.column_stack([x, np.ones_like(x)])
    (k_hat, c_hat), *_ = np.linalg.lstsq(A, y, rcond=None)
    out = (
        registry.QUERIES["q395_weibull_fit"](spark, sf_dir)
        .filter("event_type = 'click'")
        .toPandas()
        .iloc[0]
    )
    assert out["n_durations"] == n
    assert abs(out["shape_k"] - k_hat) < 1e-3
    assert abs(out["scale_lambda"] - np.exp(-c_hat / k_hat)) < 1.0


def test_rbo_matches_bruteforce_depth_loop(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 10**9 // 86400).astype(int)
    out = (
        registry.QUERIES["q394_rank_biased_overlap"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    et = out.index[0]
    sub = ev[ev["event_type"] == et]

    def top(par):
        s = (
            sub[sub["day"] % 2 == par]
            .groupby("user_id")["value"]
            .sum()
            .round(6)
        )
        df = s.reset_index().sort_values(
            ["value", "user_id"], ascending=[False, True]
        )
        return list(df["user_id"].head(20))

    A, B = top(0), top(1)
    p, k = 0.9, 20
    rbo = 0.0
    for d in range(1, k + 1):
        inter = len(set(A[:d]) & set(B[:d]))
        rbo += (1 - p) * p ** (d - 1) * inter / d
    assert abs(out.loc[et, "rbo"] - rbo) < 1e-4


def test_book_walk_matches_python_walk(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev[ev["event_id"] % 7 == 0]
    out = (
        registry.QUERIES["q385_book_walk"](spark, sf_dir)
        .toPandas()
        .set_index(["event_type", "order_size"])
    )
    offsets = (0, 2, 5, 9, 14)
    et = ev["event_type"].iloc[0]
    sub = ev[ev["event_type"] == et]
    for s_tgt in (5, 30):
        slips, fills, full = [], [], 0
        for _, r in sub.iterrows():
            p1 = int(np.floor(r["value"] * 100))
            rem, cost, filled = s_tgt, 0, 0
            for lvl in range(5):
                size = int((r["event_id"] + (lvl + 1) * 13) % 9 + 1)
                take = max(0, min(size, rem))
                cost += take * (p1 + offsets[lvl])
                filled += take
                rem -= take
            slips.append((cost / filled - p1) / p1 * 1e4)
            fills.append(filled / s_tgt)
            full += filled >= s_tgt
        row = out.loc[(et, s_tgt)]
        assert row["n_orders"] == len(sub)
        assert abs(row["avg_slippage_bps"] - np.mean(slips)) < 1e-3
        assert abs(row["avg_fill_rate"] - np.mean(fills)) < 1e-5
        assert abs(row["full_fill_share"] - full / len(sub)) < 1e-5


def test_decay_trending_matches_numpy(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    t_now = ev["ts"].astype("int64").max() / 1e9
    out = (
        registry.QUERIES["q403_decay_trending"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    et = "click"
    sub = ev[ev["event_type"] == et]
    age_h = (t_now - sub["ts"].astype("int64") / 1e9) / 3600.0
    lam = 0.6931471805599453 / 24.0
    want = float((sub["value"] * np.exp(-lam * age_h)).sum())
    assert abs(out.loc[et, "score_hl24"] - want) < 1e-2


def test_ledger_reconciliation_matches_pandas(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    recomp = (
        li.assign(
            v=li["l_extendedprice"]
            * (1 - li["l_discount"])
            * (1 + li["l_tax"])
        )
        .groupby("l_orderkey")["v"]
        .sum()
    )
    j = o.merge(
        recomp, left_on="o_orderkey", right_index=True, how="left"
    )
    matched = j[j["v"].notna()]
    rel = (matched["v"] - matched["o_totalprice"]).abs() / matched[
        "o_totalprice"
    ]
    out = (
        registry.QUERIES["q405_ledger_reconciliation"](spark, sf_dir)
        .toPandas()
        .set_index("status")
    )
    assert out.loc["matched", "n_orders"] == len(matched)
    assert abs(out.loc["matched", "avg_rel_gap"] - rel.mean()) < 1e-5
    assert (
        out.loc["matched", "n_within_tol"] == int((rel <= 0.01).sum())
    )


def test_burrows_delta_matches_numpy(spark, sf_dir):
    from crypto_prediction_etl_spark.plans.text_q import _Q376_WORDS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    rows = {}
    tot = {}
    for src, g in docs.groupby("source"):
        toks = [t for txt in g["text"] for t in txt.lower().split(" ")]
        tot[src] = len(toks)
        from collections import Counter

        c = Counter(toks)
        rows[src] = {w: c.get(w, 0) / len(toks) for w in _Q376_WORDS}
    srcs = sorted(rows)
    F_ = np.array([[rows[s][w] for w in _Q376_WORDS] for s in srcs])
    mu, sd = F_.mean(0), F_.std(0)
    keep = sd > 0
    Z = (F_[:, keep] - mu[keep]) / sd[keep]
    out = (
        registry.QUERIES["q376_burrows_delta"](spark, sf_dir)
        .toPandas()
        .set_index(["source_a", "source_b"])
    )
    a, b = srcs[0], srcs[1]
    want = np.abs(Z[0] - Z[1]).mean()
    assert abs(out.loc[(a, b), "delta"] - want) < 1e-5
    assert out.loc[(a, b), "n_words"] == int(keep.sum())


def test_ecod_matches_numpy(spark, sf_dir, emb):
    ids, labels, V = emb
    X = V[:, :8]
    n = len(X)
    scores = np.zeros(n)
    for d in range(8):
        order = np.lexsort((ids, X[:, d]))
        r = np.empty(n)
        r[order] = np.arange(1, n + 1)
        tail = np.minimum(r / n, (n - r + 1) / n)
        scores += -np.log(tail)
    out = registry.QUERIES["q414_ecod_outliers"](spark, sf_dir).collect()
    want_top = int(np.lexsort((ids, -np.round(scores, 4)))[0])
    assert out[0].vec_id == ids[want_top]
    assert abs(out[0].score - round(scores[want_top], 4)) < 1e-3


def test_embedding_drift_matches_numpy(spark, sf_dir, emb):
    from crypto_prediction_etl_spark.plans.similarity_q import (
        _Q386_BITS,
        _q386_plane,
    )

    ids, _, V = emb
    W_ = np.array(
        [
            [_q386_plane(b, d) for d in range(64)]
            for b in range(_Q386_BITS)
        ],
        dtype=float,
    )
    bits = (V @ W_.T >= 0).astype(int)
    codes = (bits * (1 << np.arange(_Q386_BITS))).sum(1)
    pa = np.bincount(codes[ids % 2 == 0], minlength=64).astype(float)
    pb = np.bincount(codes[ids % 2 == 1], minlength=64).astype(float)
    pa, pb = pa / pa.sum(), pb / pb.sum()
    m = (pa + pb) / 2

    def kl(p, q):
        mask = p > 0
        return float((p[mask] * np.log(p[mask] / q[mask])).sum())

    want = 0.5 * kl(pa, m) + 0.5 * kl(pb, m)
    out = registry.QUERIES["q386_embedding_drift"](spark, sf_dir).collect()[0]
    assert abs(out.js_divergence - want) < 1e-5


def test_vocab_coverage_matches_numpy(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .toPandas()["text"]
    )
    from collections import Counter

    c = Counter(t for txt in docs for t in txt.lower().split(" "))
    cnts = np.sort(np.array(list(c.values())))[::-1]
    out = registry.QUERIES["q407_vocab_coverage"](spark, sf_dir).collect()[0]
    assert out.n_types == len(cnts)
    assert out.n_tokens == int(cnts.sum())
    for v in (100, 1000, 4000):
        want = cnts[:v].sum() / cnts.sum()
        assert abs(getattr(out, f"cov_{v}") - want) < 1e-5


def test_group_sequential_final_look_matches_welch(spark, sf_dir):
    """Cross-QUERY consistency: q416's look-4 z (100% of data) must
    equal q168's Welch t per event type up to the sample/population
    variance convention (q168 uses n-1; the magnitude check uses a
    loose band to absorb it)."""
    gs = (
        registry.QUERIES["q416_group_sequential"](spark, sf_dir)
        .filter("look = 4")
        .toPandas()
        .set_index("event_type")
    )
    ab = (
        registry.QUERIES["q168_ab_test_stats"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    for et in gs.index:
        assert abs(gs.loc[et, "z"] - ab.loc[et, "welch_t"]) < 0.02, et


def test_kingman_wait_increases_with_utilization(spark, sf_dir):
    out = registry.QUERIES["q401_kingman_backpressure"](
        spark, sf_dir
    ).toPandas()
    for et, g in out.groupby("event_type"):
        g = g.sort_values("util")
        waits = g["kingman_wait_s"].to_list()
        assert waits == sorted(waits), (et, waits)
        rates = g["required_rate"].to_list()
        assert rates == sorted(rates, reverse=True), (et, rates)


def test_readability_matches_pure_python(spark, sf_dir):
    import re as _re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    src = docs["source"].iloc[0]
    sub = docs[docs["source"] == src]
    eases, grades = [], []
    for t in sub["text"]:
        low = t.lower()
        w = max(1, len(_re.findall(r"[a-z0-9]+", low)))
        syl = max(1, len(_re.findall(r"[aeiouy]+", low)))
        s = max(1, len(_re.findall(r"[.!?]+", t)))
        eases.append(206.835 - 1.015 * w / s - 84.6 * syl / w)
        grades.append(0.39 * w / s + 11.8 * syl / w - 15.59)
    out = (
        registry.QUERIES["q366_readability"](spark, sf_dir)
        .filter(f"source = '{src}'")
        .collect()[0]
    )
    assert out.docs == len(sub)
    assert abs(out.avg_ease - np.mean(eases)) < 1e-3
    assert abs(out.avg_grade - np.mean(grades)) < 1e-3


def test_self_bleu_matches_pure_python(spark, sf_dir):
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    texts = {r.doc_id: r.text.lower().split(" ") for r in docs.itertuples()}

    def grams(toks, n):
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    tot = {1: Counter(), 2: Counter()}
    per = {}
    for did, toks in texts.items():
        per[did] = {n: grams(toks, n) for n in (1, 2)}
        for n in (1, 2):
            tot[n].update(per[did][n])
    sbs = {}
    for did in texts:
        ps = []
        ok = True
        for n in (1, 2):
            own = per[did][n]
            denom = sum(own.values())
            if denom == 0:
                ok = False
                break
            num = sum(
                min(c, tot[n][g] - c) for g, c in own.items()
            )
            ps.append(num / denom)
        if ok:
            sbs[did] = float(np.sqrt(ps[0] * ps[1]))
    pdf = docs.set_index("doc_id")
    by_src = {}
    for did, sb in sbs.items():
        by_src.setdefault(pdf.loc[did, "source"], []).append(sb)
    out = (
        registry.QUERIES["q379_self_bleu"](spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    for src, vals in by_src.items():
        assert out.loc[src, "n_docs"] == len(vals)
        assert abs(out.loc[src, "avg_self_bleu"] - np.mean(vals)) < 1e-5


def test_mixture_materializer_accounting(spark, sf_dir):
    out = registry.QUERIES["q400_mixture_materializer"](
        spark, sf_dir
    ).toPandas()
    # copies accounting: docs_out >= docs_in * floor(rate) is implied;
    # here check token budget proximity: total tokens_out within 5% of
    # the 2M budget (hash-Bernoulli rounding noise only)
    assert abs(out["tokens_out"].sum() - 2_000_000) / 2_000_000 < 0.05
    # temperature < 1: up-sampled sources are exactly the
    # below-average-share ones
    nat = out["tokens_in"] / out["tokens_in"].sum()
    up = out["target_share"] > nat
    assert (up == (nat < nat.mean())).mean() > 0.8


def test_lineage_manifest_monotone_and_consistent(spark, sf_dir):
    rows = (
        registry.QUERIES["q417_lineage_manifest"](spark, sf_dir)
        .toPandas()
        .sort_values("stage_no")
    )
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows["rows_out"].iloc[0] == docs_n
    assert (rows["rows_out"].diff().dropna() <= 0).all()
    assert rows["chained_hash"].nunique() == len(rows)
