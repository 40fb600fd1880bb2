"""pin_frame strategy knob (SPARK_GRAFT_PIN_MODE): results must be
pin-strategy-independent, and the knob must validate its input.

The full-catalog proof is tools/hostile_replay.py --persist-pins
(420/420, recorded in BENCH_NOTES r10); these tests keep a fast
in-suite guard on the mechanism itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_prediction_etl_spark import pinning
from crypto_prediction_etl_spark.operators.dedup import exact_dedup
from crypto_prediction_etl_spark.sources.readers import table
from tests.conftest import SF_DIR_SMOKE


def test_pin_mode_default_and_validation(monkeypatch):
    monkeypatch.delenv(pinning.PIN_MODE_ENV, raising=False)
    assert pinning.pin_mode() == "localCheckpoint"
    monkeypatch.setenv(pinning.PIN_MODE_ENV, "persist")
    assert pinning.pin_mode() == "persist"
    monkeypatch.setenv(pinning.PIN_MODE_ENV, "reliable")
    with pytest.raises(ValueError, match="SPARK_GRAFT_PIN_MODE"):
        pinning.pin_mode()


def test_persist_mode_keeps_lineage_and_matches(spark, monkeypatch):
    """persist-mode pins return the same rows AND keep a recomputable
    plan (no LogicalRDD truncation — the fault-tolerance point)."""
    docs = table(spark, SF_DIR_SMOKE, "documents").limit(200)
    base = sorted(
        map(tuple, exact_dedup(docs).collect())
    )
    monkeypatch.setenv(pinning.PIN_MODE_ENV, "persist")
    pinned = exact_dedup(docs)
    assert sorted(map(tuple, pinned.collect())) == base
    analyzed = pinned._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" not in analyzed  # lineage kept => recomputable
    assert "InMemoryRelation" in pinned._jdf.queryExecution().optimizedPlan().toString()
    # Don't leave the persisted frame in the shared session's
    # CacheManager — cache substitution into unrelated later plans is
    # the documented q89 hazard.
    pinned.unpersist()


def test_default_mode_truncates(spark, monkeypatch):
    monkeypatch.delenv(pinning.PIN_MODE_ENV, raising=False)
    docs = table(spark, SF_DIR_SMOKE, "documents").limit(50)
    analyzed = (
        exact_dedup(docs)._jdf.queryExecution().analyzed().toString()
    )
    assert "LogicalRDD" in analyzed  # the pinned fingerprint frame


def test_pin_false_stays_lazy(spark, monkeypatch):
    """pin=False skips materialization entirely — plan-only callers
    (fingerprint tooling) must not trigger a Spark job (ADVICE r9)."""
    docs = table(spark, SF_DIR_SMOKE, "documents")
    frame = exact_dedup(docs, pin=False)
    analyzed = frame._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" not in analyzed


def test_exact_dedup_rejects_streaming(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("doc_id"), F.lit("x").alias("text"))
    )
    with pytest.raises(TypeError, match="streaming_exact_dedup"):
        exact_dedup(stream)


def test_pin_loop_ignores_persist_mode(spark, monkeypatch):
    """Iterative lineage-bounding pins (ADVICE r10 medium): pin_loop
    must truncate lineage EVEN in persist mode — persist would keep
    the whole loop's lineage and grow the plan per round, falsifying
    q249's 'plan depth stays bounded' contract."""
    monkeypatch.setenv(pinning.PIN_MODE_ENV, "persist")
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    pinned = pinning.pin_loop(df)
    analyzed = pinned._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in analyzed  # lineage truncated despite persist mode
    # and the rows are intact
    assert pinned.count() == 100
