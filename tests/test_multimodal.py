"""Multimodal plumbing: binary payload round-trip + mapInPandas kernel
exactness vs a local recompute."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crypto_prediction_etl_spark.operators.multimodal import (
    decode_features,
    synthetic_payload,
)
from crypto_prediction_etl_spark.sources.readers import table


def test_payload_is_binary_and_deterministic(spark, sf_dir):
    p = synthetic_payload(table(spark, sf_dir, "documents"))
    assert dict(p.dtypes)["payload"] == "binary"
    a = {r.doc_id: bytes(r.payload) for r in p.limit(20).collect()}
    b = {r.doc_id: bytes(r.payload) for r in p.limit(20).collect()}
    assert a == b
    sample = next(iter(a.values()))
    assert sample.startswith(b"W=")


def test_decode_features_match_local_recompute(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    feats = {
        r.doc_id: r.asDict()
        for r in decode_features(synthetic_payload(docs)).collect()
    }
    local = docs.select("doc_id", "text").collect()
    assert len(feats) == len(local)
    for row in local[:50]:
        body = row.text.encode()
        f = feats[row.doc_id]
        assert f["width"] == row.doc_id % 64 + 16
        assert f["height"] == row.doc_id % 48 + 16
        assert f["n_bytes"] == len(body)
        assert abs(f["mean_byte"] - sum(body) / len(body)) < 1e-9
        assert f["max_byte"] == max(body)
        assert f["body_checksum"] == hashlib.md5(body).hexdigest()


def test_unknown_codec_raises(spark):
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"\x89PNG\r\n fake"]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception) as exc:
        decode_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or "PIL" in str(exc.value)
