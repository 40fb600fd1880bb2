"""Full pure-python mirrors for the 16 hash-keyed tail queries.

VERDICT r6 item 2: every never-driver-adjudicated query should carry
at least two independent checks.  The 16 queries here were previously
covered only by invariance laws (tests/test_r6_tail_pandas.py invariant
batches) because their outputs depend on the engine's portable hash.
That hash is plain md5 arithmetic (``functions/portable.hash64`` =
first 15 hex digits of md5, parsed base 16), so it is computable with
``hashlib`` alone — each test below recomputes the ENTIRE query in
pure python/numpy, hash included, with no Spark expression reuse.
Spark is used only to fetch raw input tables and run the query under
test.

Together with the law batches this gives each of the 16 two orthogonal
independent checks: a defining-identity invariant and a full value
mirror.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from crypto_prediction_etl_spark.plans import registry
from crypto_prediction_etl_spark.sources.readers import table as _tbl

registry.load_all()

PRIME = 2147483647  # MinHash modulus, 2^31 - 1
HASH_SPACE = float(1 << 60)


def h64(s) -> int:
    """Pure-python replica of functions/portable.hash64 (md5-based)."""
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _prnd(x, d: int):
    return math.floor(x * 10**d + 0.5001) / 10**d


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Shared corpus derivations (python-side)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_pdf(spark, sf_dir):
    return (
        _tbl(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source")
        .toPandas()
    )


@pytest.fixture(scope="module")
def events_pdf(spark, sf_dir):
    return (
        _tbl(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )


@pytest.fixture(scope="module")
def minhash_pairs_py(docs_pdf):
    """Pure-python MinHash-LSH verified pair set (threshold 0.8, n=3):
    the operators/dedup pipeline re-derived with hashlib only."""
    from crypto_prediction_etl_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_PERMS,
    )

    shingle_sets: dict[int, set] = {}
    for _, r in docs_pdf.iterrows():
        toks = str(r["text"]).lower().split(" ")
        if len(toks) < 3:
            continue
        shs = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if shs:
            shingle_sets[int(r["doc_id"])] = shs
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    buckets: dict = defaultdict(set)
    for did, shs in shingle_sets.items():
        hs = [h64(s) % PRIME for s in shs]
        sig = [min((a * h + b) % PRIME for h in hs) for a, b in MINHASH_PERMS]
        for band in range(LSH_BANDS):
            key = ",".join(
                str(sig[band * rows_per_band + j]) for j in range(rows_per_band)
            )
            buckets[(band, _md5hex(key))].add(did)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    pairs = []
    for a, b in sorted(cands):
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        jac = inter / float(len(sa) + len(sb) - inter)
        if jac >= 0.8:
            pairs.append((a, b, jac))
    return pairs


# ---------------------------------------------------------------------------
# q286 KMV sketch union-merge
# ---------------------------------------------------------------------------


def test_q286_kmv_union_merge_mirror(spark, sf_dir, events_pdf):
    K = 64
    ts = pd.to_datetime(events_pdf["ts"]).dt.floor("min")
    items = {
        (f"{int(u)}@{t.strftime('%Y-%m-%dT%H:%M')}", int(e) % 2)
        for u, t, e in zip(
            events_pdf["user_id"], ts, events_pdf["event_id"]
        )
    }
    n_exact = len({it for it, _ in items})
    hv = {(h64(it), sh) for it, sh in items}
    sketches = set()
    for sh in (0, 1):
        vals = sorted(h for h, s in hv if s == sh)[:K]
        sketches.update(vals)
    merged = sorted(sketches)
    kth = merged[K - 1]
    est = (K - 1.0) * HASH_SPACE / kth
    out = (
        registry.QUERIES["q286_kmv_union_merge"](spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    assert int(out["n_exact"]) == n_exact
    assert out["kmv_union_estimate"] == pytest.approx(_prnd(est, 2), abs=1e-9)
    assert out["rel_err"] == pytest.approx(
        _prnd(abs(est - n_exact) / n_exact, 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# q296 deterministic permutation test
# ---------------------------------------------------------------------------


def test_q296_permutation_test_mirror(spark, sf_dir, events_pdf):
    B = 64
    u = (
        events_pdf.groupby("user_id")["value"]
        .mean()
        .reset_index()
        .rename(columns={"value": "y"})
    )
    u["grp"] = u["user_id"].astype(int) % 2
    d_obs = u.loc[u["grp"] == 1, "y"].mean() - u.loc[u["grp"] == 0, "y"].mean()
    n_extreme = 0
    for p in range(1, B + 1):
        pg = np.array([h64(f"{int(x)}#{p}") % 2 for x in u["user_id"]])
        d_perm = u["y"][pg == 1].mean() - u["y"][pg == 0].mean()
        if abs(d_perm) >= abs(d_obs):
            n_extreme += 1
    out = (
        registry.QUERIES["q296_permutation_test"](spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    assert int(out["n_units"]) == len(u)
    assert out["observed_diff"] == pytest.approx(_prnd(d_obs, 6), abs=2e-6)
    assert int(out["n_extreme"]) == n_extreme
    assert out["p_value"] == pytest.approx(
        _prnd((n_extreme + 1.0) / (B + 1.0), 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# q307 duplicate rate by source / q359 threshold sweep (minhash consumers)
# ---------------------------------------------------------------------------


def test_q307_dup_rate_by_source_mirror(spark, sf_dir, docs_pdf, minhash_pairs_py):
    near = {a for a, _, _ in minhash_pairs_py} | {
        b for _, b, _ in minhash_pairs_py
    }
    by_fp = defaultdict(list)
    for _, r in docs_pdf.iterrows():
        by_fp[_md5hex(str(r["text"]))].append(int(r["doc_id"]))
    exact = set()
    for ids in by_fp.values():
        if len(ids) > 1:
            exact.update(sorted(ids)[1:])
    exp = defaultdict(lambda: [0, 0, 0])  # n_docs, n_exact, n_near
    for _, r in docs_pdf.iterrows():
        s, did = r["source"], int(r["doc_id"])
        exp[s][0] += 1
        exp[s][1] += did in exact
        exp[s][2] += did in near
    out = (
        registry.QUERIES["q307_dup_rate_by_source"](spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    assert set(out.index) == set(exp)
    for s, (nd, ne, nn) in exp.items():
        assert int(out.loc[s, "n_docs"]) == nd
        assert int(out.loc[s, "n_exact_dup"]) == ne
        assert int(out.loc[s, "n_near_dup"]) == nn
        assert out.loc[s, "near_dup_rate"] == pytest.approx(
            _prnd(nn / nd, 6), abs=1e-9
        )


def test_q359_dedup_threshold_sweep_mirror(spark, sf_dir, minhash_pairs_py):
    js = [_prnd(j, 6) for _, _, j in minhash_pairs_py]
    out = (
        registry.QUERIES["q359_dedup_threshold_sweep"](spark, sf_dir)
        .toPandas()
        .set_index("threshold")
    )
    for t in (0.80, 0.85, 0.90, 0.95):
        hits = [
            (a, b, j)
            for (a, b, _), j in zip(minhash_pairs_py, js)
            if j >= t
        ]
        key = _prnd(t, 2)
        if not hits:
            assert key not in out.index
            continue
        row = out.loc[key]
        assert int(row["n_pairs"]) == len(hits)
        docs = {a for a, _, _ in hits} | {b for _, b, _ in hits}
        assert int(row["n_docs_affected"]) == len(docs)
        assert row["mean_jaccard"] == pytest.approx(
            _prnd(np.mean([j for _, _, j in hits]), 6), abs=2e-6
        )


# ---------------------------------------------------------------------------
# q315 Poisson bootstrap (md5 + LCG resampling)
# ---------------------------------------------------------------------------


def test_q315_poisson_bootstrap_mirror(spark, sf_dir):
    M, STRIDE, MULT, B = 2147483647, 2654435761, 1103515245, 100
    CDF = (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238463,
        0.9963401531726563,
        0.9994058151824183,
    )
    li = (
        _tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .toPandas()
    )
    h1 = np.array(
        [
            h64(f"{int(o)}:{int(l)}") % M
            for o, l in zip(li["l_orderkey"], li["l_linenumber"])
        ],
        dtype=np.int64,
    )
    x = li["l_extendedprice"].to_numpy()
    flags = li["l_returnflag"].to_numpy()
    out = (
        registry.QUERIES["q315_poisson_bootstrap"](spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    for fl in np.unique(flags):
        m = flags == fl
        hs, xs = h1[m], x[m]
        mbs = []
        for b in range(B):
            # exact int64 LCG; python ints avoid overflow concerns
            u = np.array(
                [((int(h) + b * STRIDE) % M) * MULT % M for h in hs],
                dtype=np.float64,
            ) / M
            w = np.searchsorted(np.array(CDF), u, side="right")
            sw = w.sum()
            if sw > 0:
                mbs.append(_prnd(float((w * xs).sum()) / sw, 4))
        row = out.loc[fl]
        assert int(row["n_resamples"]) == len(mbs)
        assert row["point_mean"] == pytest.approx(
            _prnd(float(xs.mean()), 4), abs=1.1e-4
        )
        lo, hi = np.percentile(np.array(mbs), [2.5, 97.5])
        assert row["ci_lo"] == pytest.approx(_prnd(float(lo), 4), abs=1.1e-4)
        assert row["ci_hi"] == pytest.approx(_prnd(float(hi), 4), abs=1.1e-4)


# ---------------------------------------------------------------------------
# q320 hashed linear classifier / q334 threshold sweep
# ---------------------------------------------------------------------------


def _q320_scores_py(docs_pdf):
    """doc_id -> (score, n_tokens, n_active_buckets, prob6)."""
    wcache: dict[int, float] = {}
    res = {}
    for _, r in docs_pdf.iterrows():
        toks = re.findall(r"[a-z0-9]+", str(r["text"]).lower())
        if not toks:
            continue
        cnt = Counter(h64(t) % 512 for t in toks)
        num = 0.0
        for bkt, c in cnt.items():
            w = wcache.get(bkt)
            if w is None:
                w = (h64(f"w:{bkt}") % 2001 - 1000) / 1000.0
                wcache[bkt] = w
            num += c * w
        score = num / len(toks)
        res[int(r["doc_id"])] = (
            score,
            len(toks),
            len(cnt),
            _prnd(1.0 / (1.0 + math.exp(-score)), 6),
        )
    return res


def test_q320_hashed_linear_classifier_mirror(spark, sf_dir, docs_pdf):
    exp = _q320_scores_py(docs_pdf)
    out = (
        registry.QUERIES["q320_hashed_linear_classifier"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert set(out.index) == set(exp)
    for did, (score, n_tok, n_act, prob) in exp.items():
        row = out.loc[did]
        assert int(row["n_tokens"]) == n_tok
        assert int(row["n_active_buckets"]) == n_act
        assert row["score"] == pytest.approx(_prnd(score, 6), abs=2e-6)
        assert row["prob_keep"] == pytest.approx(prob, abs=2e-6)
        assert int(row["keep"]) == int(prob >= 0.5)


def test_q334_threshold_sweep_mirror(spark, sf_dir, docs_pdf):
    exp = _q320_scores_py(docs_pdf)
    y = {}
    for _, r in docs_pdf.iterrows():
        toks = re.findall(r"[a-z0-9]+", str(r["text"]).lower())
        if toks:
            y[int(r["doc_id"])] = int("join" in toks)
    out = (
        registry.QUERIES["q334_threshold_sweep"](spark, sf_dir)
        .toPandas()
        .set_index("threshold")
    )
    for t in (0.45, 0.475, 0.5, 0.525, 0.55):
        tp = sum(
            1 for d, (_, _, _, p) in exp.items() if p >= t and y[d] == 1
        )
        fp = sum(
            1 for d, (_, _, _, p) in exp.items() if p >= t and y[d] == 0
        )
        fn = sum(1 for d, (_, _, _, p) in exp.items() if p < t and y[d] == 1)
        row = out.loc[_prnd(t, 6)]
        assert (int(row["tp"]), int(row["fp"]), int(row["fn"])) == (tp, fp, fn)
        if tp + fp:
            assert row["precision_"] == pytest.approx(
                _prnd(tp / (tp + fp), 6), abs=1e-9
            )
        if tp + fn:
            assert row["recall_"] == pytest.approx(
                _prnd(tp / (tp + fn), 6), abs=1e-9
            )
        if 2 * tp + fp + fn:
            assert row["f1"] == pytest.approx(
                _prnd(2.0 * tp / (2 * tp + fp + fn), 6), abs=1e-9
            )


# ---------------------------------------------------------------------------
# q328 soft-dedup weights (md5 fingerprint groups)
# ---------------------------------------------------------------------------


def test_q328_soft_dedup_weights_mirror(spark, sf_dir, docs_pdf):
    fp = {
        int(r["doc_id"]): _md5hex(
            re.sub(r"\s+", " ", str(r["text"]).lower()).strip()
        )
        for _, r in docs_pdf.iterrows()
    }
    sizes = Counter(fp.values())
    out = (
        registry.QUERIES["q328_soft_dedup_weights"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert set(out.index) == set(fp)
    for did, f in fp.items():
        n = sizes[f]
        row = out.loc[did]
        assert int(row["n_copies"]) == n
        assert row["w_uniform"] == pytest.approx(_prnd(1.0 / n, 6), abs=1e-9)
        assert row["w_sqrt"] == pytest.approx(
            _prnd(1.0 / math.sqrt(n), 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# q344 DSIR importance weights (smoothed unigram LLR)
# ---------------------------------------------------------------------------


def test_q344_dsir_weights_mirror(spark, sf_dir, docs_pdf):
    c_src: Counter = Counter()
    c_tgt: Counter = Counter()
    doc_toks = {}
    for _, r in docs_pdf.iterrows():
        toks = str(r["text"]).lower().split(" ")
        doc_toks[int(r["doc_id"])] = toks
        c_src.update(toks)
        if r["lang"] == "en":
            c_tgt.update(toks)
    n_src = sum(c_src.values())
    n_tgt = sum(c_tgt.values())
    v = len(c_src)
    out = (
        registry.QUERIES["q344_dsir_weights"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    exp_ids = {d for d in doc_toks if d % 7 == 0}
    assert set(out.index) == exp_ids
    for did in exp_ids:
        toks = doc_toks[did]
        llr = sum(
            math.log(
                ((c_tgt[t] + 1.0) / (n_tgt + v))
                / ((c_src[t] + 1.0) / (n_src + v))
            )
            for t in toks
        )
        row = out.loc[did]
        assert int(row["n_toks"]) == len(toks)
        assert row["dsir_log_weight"] == pytest.approx(
            _prnd(llr, 6), abs=5e-6
        )
        assert row["per_token_log_weight"] == pytest.approx(
            _prnd(llr / len(toks), 6), abs=2e-6
        )


# ---------------------------------------------------------------------------
# q361 reshard movement audit (HRW vs mod)
# ---------------------------------------------------------------------------


def test_q361_reshard_audit_mirror(spark, sf_dir, docs_pdf):
    n = 16
    rows = []
    for did in docs_pdf["doc_id"].astype(int):
        scores = [h64(f"{did}:{i}") for i in range(n + 1)]
        before_h = int(np.argmax(scores[:n]))
        after_h = int(np.argmax(scores))
        rows.append(("rendezvous", before_h, after_h))
        hd = h64(did)
        rows.append(("mod", hd % n, hd % (n + 1)))
    out = (
        registry.QUERIES["q361_reshard_audit"](spark, sf_dir)
        .toPandas()
        .set_index("strategy")
    )
    for strat in ("mod", "rendezvous"):
        sub = [(b, a) for s, b, a in rows if s == strat]
        moved = sum(1 for b, a in sub if b != a)
        loads = Counter(b for b, _ in sub)
        max_over_avg = max(loads.values()) / (len(sub) / float(n))
        row = out.loc[strat]
        assert int(row["n_keys"]) == len(sub)
        assert int(row["n_moved"]) == moved
        assert row["moved_frac"] == pytest.approx(
            _prnd(moved / len(sub), 6), abs=1e-9
        )
        assert row["load_max_over_avg"] == pytest.approx(
            _prnd(max_over_avg, 4), abs=1e-9
        )


# ---------------------------------------------------------------------------
# q383 IPS / SNIPS off-policy evaluation
# ---------------------------------------------------------------------------


def test_q383_ips_offpolicy_mirror(spark, sf_dir, events_pdf):
    WCAP = 20.0
    w = np.zeros(len(events_pdf))
    vals = events_pdf["value"].to_numpy()
    for i, (u, et) in enumerate(
        zip(events_pdf["user_id"], events_pdf["event_type"])
    ):
        pi = "purchase" if h64(int(u)) % 2 == 0 else "click"
        if et == pi:
            p_log = 0.1 + 0.8 * (h64(f"{int(u)}:{et}") % 1000) / 999.0
            w[i] = min(WCAP, 1.0 / p_log)
    out = (
        registry.QUERIES["q383_ips_offpolicy"](spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    n = len(events_pdf)
    assert int(out["n_logged"]) == n
    assert int(out["n_matched"]) == int((w > 0).sum())
    assert out["logging_value"] == pytest.approx(
        _prnd(float(vals.mean()), 4), abs=1.1e-4
    )
    assert out["ips_value"] == pytest.approx(
        _prnd(float((w * vals).sum()) / n, 4), abs=1.1e-4
    )
    assert out["snips_value"] == pytest.approx(
        _prnd(float((w * vals).sum() / w.sum()), 4), abs=1.1e-4
    )
    assert out["mean_weight"] == pytest.approx(
        _prnd(float(w.mean()), 6), abs=2e-6
    )


# ---------------------------------------------------------------------------
# q402 vnode ring balance sweep
# ---------------------------------------------------------------------------


def test_q402_vnode_balance_mirror(spark, sf_dir):
    NODES = 8
    ok = (
        _tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .toPandas()["l_orderkey"]
        .astype(int)
    )
    key_hash = {k: h64(k) for k in set(ok)}
    out = (
        registry.QUERIES["q402_vnode_balance"](spark, sf_dir)
        .toPandas()
        .set_index("vnodes")
    )
    for v in (1, 16, 64):
        slots = NODES * v
        loads = Counter()
        for k in ok:
            slot = key_hash[k] % slots
            loads[h64(slot) % NODES] += 1
        vals = np.array(list(loads.values()), dtype=float)
        row = out.loc[v]
        assert int(row["nodes_hit"]) == len(vals)
        assert int(row["max_load"]) == int(vals.max())
        assert row["mean_load"] == pytest.approx(
            _prnd(float(vals.mean()), 2), abs=1e-9
        )
        assert row["peak_to_mean"] == pytest.approx(
            _prnd(float(vals.max() / vals.mean()), 4), abs=1e-9
        )
        sd = float(vals.std())  # population sd
        assert row["load_cv"] == pytest.approx(
            _prnd(sd / float(vals.mean()), 4), abs=1e-8
        )


# ---------------------------------------------------------------------------
# q410 shard-key advisor
# ---------------------------------------------------------------------------


def test_q410_shard_key_advisor_mirror(spark, sf_dir):
    li = (
        _tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .toPandas()
        .astype(int)
    )
    out = (
        registry.QUERIES["q410_shard_key_advisor"](spark, sf_dir)
        .toPandas()
        .set_index("cand_key")
    )
    for k in ("l_orderkey", "l_partkey", "l_suppkey"):
        keys = li[k]
        shard = keys.map(lambda x: h64(x) % 32)
        loads = shard.value_counts().to_numpy().astype(float)
        cv = float(loads.std() / loads.mean())
        df = pd.DataFrame({"o": li["l_orderkey"], "s": shard})
        per_os = df.groupby(["o", "s"]).size().reset_index(name="sc")
        g = per_os.groupby("o")["sc"].agg(["sum", "max"])
        coloc = float((g["max"] / g["sum"]).mean())
        row = out.loc[k]
        assert int(row["ndv"]) == keys.nunique()
        assert row["shard_cv"] == pytest.approx(_prnd(cv, 4), abs=1.1e-4)
        assert row["order_colocation"] == pytest.approx(
            _prnd(coloc, 6), abs=2e-6
        )


# ---------------------------------------------------------------------------
# q411 cross-source duplication matrix (head fingerprints)
# ---------------------------------------------------------------------------


def test_q411_cross_source_dups_mirror(spark, sf_dir, docs_pdf):
    sf = set()
    for _, r in docs_pdf.iterrows():
        toks = str(r["text"]).lower().split(" ")
        f = _md5hex(" ".join(toks[:8]))
        sf.add((r["source"], f))
    per_src = Counter(s for s, _ in sf)
    by_f = defaultdict(set)
    for s, f in sf:
        by_f[f].add(s)
    shared = Counter()
    for f, srcs in by_f.items():
        srcs = sorted(srcs)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                shared[(srcs[i], srcs[j])] += 1
    out = (
        registry.QUERIES["q411_cross_source_dups"](spark, sf_dir)
        .toPandas()
        .set_index(["source_a", "source_b"])
    )
    assert set(out.index) == set(shared)
    for (a, b), n in shared.items():
        row = out.loc[(a, b)]
        assert int(row["shared_fps"]) == n
        assert int(row["fps_a"]) == per_src[a]
        assert int(row["fps_b"]) == per_src[b]
        assert row["containment"] == pytest.approx(
            _prnd(n / min(per_src[a], per_src[b]), 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# q415 empirical Bloom-filter audit
# ---------------------------------------------------------------------------


def test_q415_bloom_empirical_mirror(spark, sf_dir):
    K, BPK = 3, 8
    members = sorted(
        set(
            _tbl(spark, sf_dir, "lineitem")
            .select("l_partkey")
            .toPandas()["l_partkey"]
            .astype(int)
        )
    )
    probes = (
        _tbl(spark, sf_dir, "part")
        .select("p_partkey")
        .toPandas()["p_partkey"]
        .astype(int)
        + 1000000
    )
    m = len(members) * BPK
    bits = {h64(f"{p}:{i}") % m for p in members for i in range(K)}
    false_pos = 0
    for p in probes:
        nhit = sum(1 for i in range(K) if h64(f"{p}:{i}") % m in bits)
        false_pos += nhit == K
    out = (
        registry.QUERIES["q415_bloom_empirical"](spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    assert int(out["n_members"]) == len(members)
    assert int(out["m_bits"]) == m
    assert int(out["bits_set"]) == len(bits)
    assert int(out["n_probes"]) == len(probes)
    assert int(out["false_positives"]) == false_pos
    assert out["measured_fpp"] == pytest.approx(
        _prnd(false_pos / len(probes), 6), abs=1e-9
    )
    assert out["predicted_fpp"] == pytest.approx(
        _prnd((len(bits) / m) ** K, 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# q378 CCNet perplexity buckets (Kneser-Ney bigram LM)
# ---------------------------------------------------------------------------


def test_q378_ccnet_buckets_mirror(spark, sf_dir, docs_pdf):
    D = 0.75
    ev: Counter = Counter()  # (doc, lang, bigram) -> n
    for _, r in docs_pdf.iterrows():
        toks = str(r["text"]).lower().split(" ")
        for i in range(len(toks) - 1):
            ev[(int(r["doc_id"]), r["lang"], f"{toks[i]} {toks[i + 1]}")] += 1
    big: Counter = Counter()  # (lang, s) -> n (summed over docs)
    for (_, lang, s), n in ev.items():
        big[(lang, s)] += n
    hist_c: Counter = Counter()
    hist_t: Counter = Counter()
    cont: Counter = Counter()
    tot: Counter = Counter()
    for (lang, s), n in big.items():
        v, w = s.split(" ", 1)
        hist_c[(lang, v)] += n
        hist_t[(lang, v)] += 1
        cont[(lang, w)] += 1
        tot[lang] += 1
    pkn = {}
    for (lang, s), n in big.items():
        v, w = s.split(" ", 1)
        c_v = float(hist_c[(lang, v)])
        pkn[(lang, s)] = max(n - D, 0.0) / c_v + (
            D * hist_t[(lang, v)] / c_v
        ) * (cont[(lang, w)] / float(tot[lang]))
    dnll = defaultdict(lambda: [0.0, 0])  # (doc, lang) -> [sum n*ln p, sum n]
    for (doc, lang, s), n in ev.items():
        acc = dnll[(doc, lang)]
        acc[0] += n * math.log(pkn[(lang, s)])
        acc[1] += n
    rows = [
        (lang, doc, -s / n) for (doc, lang), (s, n) in dnll.items()
    ]
    exp = {}
    for lang in {r[0] for r in rows}:
        sub = sorted(
            [(nll, doc) for lg, doc, nll in rows if lg == lang]
        )
        n = len(sub)
        base, rem = divmod(n, 3)
        sizes = [base + (1 if i < rem else 0) for i in range(3)]
        idx = 0
        for b, sz in enumerate(sizes):
            chunk = sub[idx : idx + sz]
            idx += sz
            if not chunk:
                continue
            name = ("head", "middle", "tail")[b]
            nlls = np.array([c[0] for c in chunk])
            exp[(lang, name)] = (
                sz,
                float(nlls.mean()),
                float(np.exp(nlls).mean()),
            )
    out = (
        registry.QUERIES["q378_ccnet_buckets"](spark, sf_dir)
        .toPandas()
        .set_index(["lang", "bucket"])
    )
    assert set(out.index) == set(exp)
    for key, (nd, avg_nll, avg_ppl) in exp.items():
        row = out.loc[key]
        assert int(row["n_docs"]) == nd
        assert row["avg_nll"] == pytest.approx(avg_nll, abs=1e-5)
        assert row["avg_ppl"] == pytest.approx(avg_ppl, abs=1e-3)
