"""Z-order layout: envelope tightening and file-pruning effect.

The point of the z-order rewrite is that per-file min-max envelopes get
tight on BOTH interleaved dimensions, so a range predicate on either
one touches few files (and the parquet reader's row-group min-max
skipping does the same inside each file). These tests measure exactly
that, against a random-repartition baseline of the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crypto_prediction_etl_spark.operators.layout import (
    interleave_bits,
    with_zvalue,
    write_zordered,
)
from crypto_prediction_etl_spark.sources.readers import table

N_FILES = 8


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "value", F.col("ts").cast("double").alias("sec")
    )
    z_path, r_path = str(base / "zorder"), str(base / "random")
    write_zordered(ev, z_path, "value", "sec", n_files=N_FILES)
    ev.repartition(N_FILES).write.mode("overwrite").parquet(r_path)
    return ev, z_path, r_path


def _mean_file_span(spark, path: str, col: str) -> float:
    """Mean per-file (max-min) extent of ``col``, normalized by the
    global extent — 1.0 means every file spans the whole domain."""
    df = spark.read.parquet(path).select(
        F.col(col).cast("double").alias("c"),
        F.input_file_name().alias("f"),
    )
    per_file = df.groupBy("f").agg((F.max("c") - F.min("c")).alias("span"))
    g = df.agg(F.max("c") - F.min("c")).first()[0]
    spans = [r["span"] for r in per_file.collect()]
    return sum(spans) / len(spans) / g


def test_zorder_tightens_both_dims(spark, layouts):
    ev, z_path, r_path = layouts
    for col in ("value", "sec"):
        z_span = _mean_file_span(spark, z_path, col)
        r_span = _mean_file_span(spark, r_path, col)
        # random placement spans most of the domain per file (sample
        # extremes at tiny sf keep it below 1); the curve layout must
        # cut the envelope on BOTH dims at once
        assert r_span > 0.6, (col, r_span)
        assert z_span < 0.6 * r_span, (col, z_span, r_span)


def test_zorder_preserves_rows_and_prunes_files(spark, layouts):
    ev, z_path, r_path = layouts
    n = ev.count()
    z = spark.read.parquet(z_path)
    assert z.count() == n
    assert set(z.columns) == {"event_id", "value", "sec"}

    # a ~10%-wide predicate on each dim: count how many files contain
    # matching rows — the proxy for files a min-max-pruning reader opens
    stats = ev.agg(
        F.min("value"), F.max("value"), F.min("sec"), F.max("sec")
    ).first()
    for col, lo, hi in (("value", stats[0], stats[1]), ("sec", stats[2], stats[3])):
        a = lo + 0.45 * (hi - lo)
        b = lo + 0.55 * (hi - lo)
        pred = (F.col(col) >= a) & (F.col(col) <= b)
        z_files = (
            spark.read.parquet(z_path).filter(pred)
            .select(F.input_file_name()).distinct().count()
        )
        r_files = (
            spark.read.parquet(r_path).filter(pred)
            .select(F.input_file_name()).distinct().count()
        )
        assert r_files >= N_FILES - 1, (col, r_files)
        # Morton locality is asymmetric (the odd-bit dim gets the more
        # significant bit of each pair), so assert against the baseline
        # rather than an absolute count: the curve layout must open
        # fewer than 70% of the files the random layout opens
        assert z_files <= int(0.7 * r_files), (col, z_files, r_files)


def test_interleave_is_monotone_in_buckets(spark):
    # equal buckets -> equal z; the max bucket pair -> all bits set
    df = spark.range(1).select(
        interleave_bits(F.lit(255).cast("long"), F.lit(255).cast("long"), 8).alias("z_max"),
        interleave_bits(F.lit(0).cast("long"), F.lit(0).cast("long"), 8).alias("z_min"),
        interleave_bits(F.lit(1).cast("long"), F.lit(0).cast("long"), 8).alias("z_b1"),
        interleave_bits(F.lit(0).cast("long"), F.lit(1).cast("long"), 8).alias("z_b2"),
    ).first()
    assert df["z_max"] == (1 << 16) - 1
    assert df["z_min"] == 0
    # b1 owns the more-significant bit of each pair
    assert df["z_b1"] == 2 and df["z_b2"] == 1


def test_zvalue_degenerate_range(spark):
    df = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(4)], "id long, a double, b double"
    )
    out = with_zvalue(df, "a", "b", 4).select("_b1", "_b2").collect()
    assert all(r["_b1"] == 0 for r in out)  # span 0 -> bucket 0
    assert {r["_b2"] for r in out} == {0, 5, 10, 15}
