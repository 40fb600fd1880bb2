"""q315 grid-margin audit (VERDICT r12 item 4).

The Poisson-bootstrap resample means snap to the 1e-4 grid with the
portable ``floor(x*1e4 + 0.5001)`` convention, whose decision boundary
sits at frac(x*1e4) = 0.4999.  Replacing the 100x replicate explode
with a numpy partial-sum kernel reorders the float64 summation, so the
kernel is only admissible if every pre-snap resample mean keeps a
margin from that boundary that is orders above any reorder drift.

This audit computes, per SF, every (l_returnflag, b) resample mean in
exact-order-free arithmetic (numpy float64 over the full group — its
pairwise summation is closer to exact than either engine's sequential
partial sums) and asserts

    margin(mb) > 10 * sqrt(n_group) * eps * |mb|

where sqrt(n)*eps*|mb| bounds the random-walk drift of an n-term
float64 sum relative to any other order.  Measured margins at audit
time: sf0.001 ~9.9e-9 abs (~20x the bound), sf0.01 ~3.3e-8 (~80x),
sf0.1 ~1.3e-7 (~60x).  If synthetic data ever lands a mean ON the
shifted boundary this test fails before the oracle gate can flake.

Pure numpy + pyarrow (no Spark session): the audit is about the
arithmetic, not the engine.
"""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from crypto_prediction_etl_spark.plans.relational_ext import (
    _Q315_B,
    _Q315_CDF,
    _Q315_M,
    _Q315_MULT,
    _Q315_STRIDE,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SFS)
def test_q315_resample_means_clear_snap_boundary(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"],
    )
    ok = t["l_orderkey"].to_numpy()
    ln = t["l_linenumber"].to_numpy()
    flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
    x = t["l_extendedprice"].to_numpy()
    h1 = np.fromiter(
        (
            int(hashlib.md5(f"{o}:{l}".encode()).hexdigest()[:15], 16) % _Q315_M
            for o, l in zip(ok, ln)
        ),
        dtype=np.int64,
        count=len(ok),
    )
    b = np.arange(_Q315_B, dtype=np.int64)[None, :]
    u = (
        (((h1[:, None] + b * _Q315_STRIDE) % _Q315_M) * _Q315_MULT) % _Q315_M
    ).astype(np.float64) / _Q315_M
    w = np.searchsorted(np.asarray(_Q315_CDF), u, side="right").astype(np.float64)
    eps = 2.0**-52
    checked = 0
    for f in np.unique(flag):
        m = flag == f
        wf, xf = w[m], x[m]
        swx = xf @ wf  # (B,) exact-order-free pairwise sums
        sw = wf.sum(axis=0)
        live = sw > 0
        mb = swx[live] / sw[live]
        frac = mb * 1e4 - np.floor(mb * 1e4)
        margin_units = np.minimum(np.abs(frac - 0.4999), 1 - np.abs(frac - 0.4999))
        margin_abs = margin_units * 1e-4
        drift_bound = math.sqrt(m.sum()) * eps * np.abs(mb)
        assert (margin_abs > 10 * drift_bound).all(), (
            f"{sf_dir} flag={f}: min margin {margin_abs.min():.3e} vs "
            f"bound {drift_bound.max():.3e}"
        )
        checked += int(live.sum())
    assert checked == 3 * _Q315_B
