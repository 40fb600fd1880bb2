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


def test_frame_sample_shape_and_content(spark, sf_dir):
    """Frame sampler: every 2nd 64-char frame, md5s match a local
    recompute, and the last frame may be ragged (shorter)."""
    import hashlib

    from crypto_prediction_etl_spark.operators.multimodal import (
        sample_frames,
        synthetic_payload,
    )
    from crypto_prediction_etl_spark.sources.readers import table

    docs = table(spark, sf_dir, "documents").limit(50)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = sample_frames(synthetic_payload(docs), every_n=2).collect()
    by_key = {(r.doc_id, r.frame_idx): (r.frame_len, r.frame_md5) for r in got}
    expect = {}
    for doc_id, text in texts.items():
        n = (len(text) + 63) // 64
        for idx in range(0, n, 2):
            fr = text[idx * 64 : (idx + 1) * 64]
            expect[(doc_id, idx)] = (len(fr), hashlib.md5(fr.encode()).hexdigest())
    assert by_key == expect
    assert any(v[0] < 64 for v in expect.values())  # ragged tail exists


def test_resize_payload_roundtrip(spark, sf_dir):
    """Resize halves header dims; output re-parses through the same
    JVM-side metadata extractor (binary->binary composition)."""
    from pyspark.sql import functions as F

    from crypto_prediction_etl_spark.operators.multimodal import (
        payload_metadata,
        resize_payload,
        synthetic_payload,
    )
    from crypto_prediction_etl_spark.sources.readers import table

    docs = table(spark, sf_dir, "documents").limit(20)
    orig = synthetic_payload(docs)
    m0 = {
        r.doc_id: (r.w, r.h)
        for r in orig.select(
            "doc_id",
            payload_metadata(F.col("payload"))["width"].alias("w"),
            payload_metadata(F.col("payload"))["height"].alias("h"),
        ).collect()
    }
    resized = resize_payload(orig, 1, 2)
    m1 = {
        r.doc_id: (r.w, r.h)
        for r in resized.select(
            "doc_id",
            payload_metadata(F.col("payload"))["width"].alias("w"),
            payload_metadata(F.col("payload"))["height"].alias("h"),
        ).collect()
    }
    assert m1 == {k: (w // 2, h // 2) for k, (w, h) in m0.items()}
