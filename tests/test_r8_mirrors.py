"""Round-8 pure-python value mirrors.

q141_edit_distance_pairs was rewritten in round 8 (blocking key now
composes with the q45 MinHash band hash) AFTER its round-3 driver
verdict, so until its scheduled r9 re-adjudication the oracle replica
is its only full-value check.  This mirror recomputes the ENTIRE
query — shingles, MinHash signatures, band buckets, (lang, length
bucket) composition, prefix Levenshtein — in python/hashlib alone,
with no Spark expression reuse (Spark only loads the raw table and
runs the query under test).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from crypto_prediction_etl_spark.plans import registry
from crypto_prediction_etl_spark.sources.readers import table as _tbl

registry.load_all()

PRIME = 2147483647


def h64(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_q141_band_composed_edit_distance_mirror(spark, sf_dir):
    from crypto_prediction_etl_spark.operators.dedup import LSH_BANDS, MINHASH_PERMS
    from crypto_prediction_etl_spark.plans.textprep_q import (
        _Q141_BKT,
        _Q141_MAX,
        _Q141_PFX,
    )

    docs = (
        _tbl(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .toPandas()
    )
    meta: dict[int, tuple] = {}
    buckets: dict = defaultdict(set)
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        text = str(r["text"])
        meta[did] = (str(r["lang"]), int(r["n_chars"]) // _Q141_BKT, text[:_Q141_PFX])
        toks = text.lower().split(" ")
        if len(toks) < 3:
            continue  # no shingles -> no signature -> not a candidate
        shs = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        hs = [h64(s) % PRIME for s in shs]
        sig = [min((a * h + b) % PRIME for h in hs) for a, b in MINHASH_PERMS]
        for band in range(LSH_BANDS):
            key = ",".join(
                str(sig[band * rows_per_band + j]) for j in range(rows_per_band)
            )
            bk = hashlib.md5(key.encode()).hexdigest()
            buckets[(band, bk)].add(did)

    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                # composed block: same lang AND same length bucket
                if meta[a][0] == meta[b][0] and meta[a][1] == meta[b][1]:
                    cands.add((a, b))

    expected = sorted(
        (a, b, _levenshtein(meta[a][2], meta[b][2]))
        for a, b in cands
        if _levenshtein(meta[a][2], meta[b][2]) <= _Q141_MAX
    )

    got = sorted(
        (int(r["id_a"]), int(r["id_b"]), int(r["dist"]))
        for r in registry.QUERIES["q141_edit_distance_pairs"](spark, sf_dir).collect()
    )
    assert got == expected
    assert len(got) > 0, "mirror exercised zero pairs — fixture too sparse"
