"""Streaming sinks: foreachBatch writer with PK-upsert semantics.

The reference sinks to Cassandra where the composite PK makes re-sends
overwrite in place (ddl/cassandra/crypto/candles_realtime.ddl:19,
write_stream.py:1-16). Without a key-value store, the scalable
equivalent is merge-on-read: append micro-batches (cheap, no
read-modify-write in the hot path), dedup by PK at read time keeping
the newest ``ts_insert_utc``/``ts_send``. Compaction == rewriting the
table through :func:`read_hot_table` periodically.

Exactly-once: Spark checkpoints offsets per micro-batch; a replayed
batch appends duplicate PK rows, which merge-on-read collapses — same
end state as Cassandra upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def upsert_append_writer(out_dir: str):
    """foreachBatch function: append the micro-batch as parquet.

    reference shape: write_stream.py:4-16 (foreachBatch -> batch sink).
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return write


def read_hot_table(
    spark: SparkSession, path: str, pk_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Merge-on-read view: latest row per PK (upsert semantics).

    ``order_cols`` break ties among duplicate PKs (newest wins) —
    e.g. ["ts_insert_utc", "_epoch"].
    """
    df = spark.read.parquet(path)
    w = W.partitionBy(*pk_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def start_file_stream_pipeline(
    spark: SparkSession,
    source_dir: str,
    pipeline,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Wire a JSON-lines file source (Kafka stand-in for tests) through a
    transform pipeline into the upsert sink with checkpointing
    (reference: read_stream.py:6-19 + candles.py:111-124).

    ``max_files_per_trigger`` is the file-source analog of the
    reference's ``maxOffsetsPerTrigger: 10000`` micro-batch rate limit
    (reference: streaming/candles.py:21)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(source_dir)
    out = pipeline(raw)
    return (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_append_writer(out_dir))
        .start()
    )


def progress_summary(query) -> dict:
    """Offset/rate introspection from lastProgress (reference lag
    monitoring: check_offset_diff.py:39-69, session.py:130-132)."""
    p = query.lastProgress
    if not p:
        return {}
    return {
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "sources": [
            {k: s.get(k) for k in ("description", "startOffset", "endOffset", "numInputRows")}
            for s in p.get("sources", [])
        ],
    }


def compact_hot_table(
    spark: SparkSession,
    path: str,
    pk_cols: list[str],
    order_cols: list[str],
    compacted_path: str,
) -> int:
    """Rewrite the append log as its merge-on-read view (one row per
    PK) — the maintenance job that bounds read amplification; on a
    cluster this runs on a schedule exactly like Cassandra compaction.
    Returns the compacted row count."""
    hot = read_hot_table(spark, path, pk_cols, order_cols)
    hot.write.mode("overwrite").parquet(compacted_path)
    return spark.read.parquet(compacted_path).count()
