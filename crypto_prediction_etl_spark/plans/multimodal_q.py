"""Multimodal-column queries: binary payload metadata (oracle-checked)
and mapInPandas feature extraction (rows-only — Python kernel output,
cross-checked in tests/test_multimodal.py instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import o_rnd, prnd
from ..operators.multimodal import (
    decode_features,
    payload_metadata,
    synthetic_payload,
)
from ..sources.readers import table
from .registry import query


@query(
    "q70_binary_metadata",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             concat('W=', CAST(doc_id % 64 + 16 AS VARCHAR),
                    ';H=', CAST(doc_id % 48 + 16 AS VARCHAR), ';', text) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(encode(s)) AS INTEGER)      AS byte_len,
           md5(s)                                        AS checksum,
           CAST(doc_id % 64 + 16 AS INT)                 AS width,
           CAST(doc_id % 48 + 16 AS INT)                 AS height,
           CAST((doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT) AS n_pixels
    FROM p
    """,
)
def q70_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata extracted JVM-side
    (octet_length / md5 / header regex) — the multimodal column model
    at its scan layer; no Python touches the bytes."""
    payloads = synthetic_payload(table(spark, sf_dir, "documents"))
    m = payload_metadata(F.col("payload"))
    return payloads.select(
        "doc_id",
        m["byte_len"].alias("byte_len"),
        m["checksum"].alias("checksum"),
        m["width"].alias("width"),
        m["height"].alias("height"),
        m["n_pixels"].alias("n_pixels"),
    )


@query(
    "q71_multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, text,
             CAST(doc_id % 64 + 16 AS INT) AS width,
             CAST(doc_id % 48 + 16 AS INT) AS height,
             list_transform(range(1, length(text) + 1),
                            i -> ord(substr(text, i, 1))) AS bytes
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE floor((CAST(list_aggregate(bytes, 'sum') AS DOUBLE)
                            / length(text)) * 10000.0 + 0.5001) / 10000.0
           END AS mean_byte,
           CAST(coalesce(list_aggregate(bytes, 'max'), 0) AS INT) AS max_byte,
           md5(text) AS body_checksum
    FROM b
    """,
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches, deterministic fake decode): width/height/byte stats +
    body checksum, computed IN THE KERNEL from the payload bytes. The
    oracle regenerates the ground truth from the source text the
    payload embeds — the body is ASCII, so per-byte values are
    ``ord`` over characters and the md5 of the text equals the md5 of
    the body bytes — putting the Python decode kernel itself under the
    exact hash gate (the q103 technique applied to the image-shaped
    payload; only a real PNG/JPEG codec remains stubbed, PIL being
    absent from the container)."""
    payloads = synthetic_payload(table(spark, sf_dir, "documents"))
    feats = decode_features(payloads)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_bytes",
        prnd("mean_byte", 4).alias("mean_byte"),
        "max_byte",
        "body_checksum",
    )


@query(
    "q72_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(unnest(range(1, CAST(ceil(length(text) / 64.0) AS BIGINT) + 1)) AS INT) AS i
      FROM documents
    ),
    frames AS (
      SELECT f.doc_id, f.i - 1 AS frame_idx,
             substr(d.text, (f.i - 1) * 64 + 1, 64) AS fr
      FROM f JOIN documents d USING (doc_id)
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(fr) AS INT) AS frame_len, md5(fr) AS frame_md5
    FROM frames WHERE frame_idx % 2 = 0
    """,
)
def q72_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: mapInPandas
    fake-codec chunker keeps every 2nd 64-char frame, one output row
    per kept frame (the 1->N Arrow batch shape of a real demuxer).
    The oracle replays the chunker with substr over the source text —
    the kernel's frames are hash-checked, not just counted."""
    from ..operators.multimodal import sample_frames

    payloads = synthetic_payload(table(spark, sf_dir, "documents"))
    return sample_frames(payloads, every_n=2)


def _q103_oracle() -> str:
    from ..operators.multimodal import PCM_BASE_SAMPLES, PCM_WINDOW

    b, w = PCM_BASE_SAMPLES, PCM_WINDOW
    return f"""
    WITH d AS (SELECT doc_id, {b} + doc_id % {b} AS n FROM documents),
    s AS (
      SELECT doc_id, i,
             (doc_id * 7919 + i * 104729) % 65536 - 32768 AS x
      FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM d)
    ),
    p AS (
      SELECT doc_id, i, i // {w} AS window_id, x,
             lead(x) OVER (PARTITION BY doc_id ORDER BY i) AS xn
      FROM s
    )
    SELECT doc_id,
           CAST(window_id AS INTEGER) AS window_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           floor(sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)) * 1000000.0 + 0.5001) / 1000000.0 AS rms,
           CAST(count(*) FILTER (WHERE xn IS NOT NULL
                                   AND (i + 1) // {w} = window_id
                                   AND x * xn < 0) AS BIGINT) AS zero_crossings
    FROM p GROUP BY doc_id, window_id
    """


@query("q103_audio_pcm_features", oracle=_q103_oracle())
def q103_audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction with a REAL decode path: little-endian
    int16 PCM payloads in a binary column, decoded per Arrow batch
    with np.frombuffer, reduced to per-window sample count, RMS energy
    and zero-crossing counts (mapInPandas 1->N demux, zero shuffle).

    The waveform is a deterministic integer sequence, so the oracle
    regenerates the ground truth arithmetically and checks features
    computed FROM THE BYTES — the decode layer itself is under the
    hash gate, unlike the codec-stubbed image path (q71). RMS uses the
    exact integer sum of squares (window*2^30 < 2^53) before one
    divide + correctly-rounded sqrt, so the floats are bit-identical
    cross-engine."""
    from ..operators.multimodal import pcm_window_features, synthetic_pcm_payload

    payloads = synthetic_pcm_payload(table(spark, sf_dir, "documents"))
    feats = pcm_window_features(payloads)
    return feats.select(
        "doc_id",
        "window_id",
        "n_samples",
        prnd(F.col("rms"), 6).alias("rms"),
        "zero_crossings",
    )


# ---------------------------------------------------------------------------
# q274 energy-threshold VAD segments over decoded PCM windows
# ---------------------------------------------------------------------------


def _q274_oracle() -> str:
    from ..operators.multimodal import PCM_BASE_SAMPLES, PCM_WINDOW

    b, w = PCM_BASE_SAMPLES, PCM_WINDOW
    return f"""
    WITH d AS (SELECT doc_id, {b} + doc_id % {b} AS n FROM documents),
    s AS (
      SELECT doc_id, i, i // {w} AS window_id,
             (doc_id * 7919 + i * 104729) % 65536 - 32768 AS x
      FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM d)
    ),
    wf AS (
      SELECT doc_id, window_id,
             floor(sqrt(CAST(sum(x * x) AS DOUBLE) / count(*)) * 1000000.0 + 0.5001) / 1000000.0 AS rms
      FROM s GROUP BY doc_id, window_id
    ),
    thr AS (
      SELECT doc_id, window_id, rms,
             CAST(rms >= avg(rms) OVER (PARTITION BY doc_id) AS INT) AS active
      FROM wf
    ),
    isl AS (
      SELECT doc_id, window_id, rms, active,
             window_id - row_number() OVER (PARTITION BY doc_id, active
                                            ORDER BY window_id) AS grp
      FROM thr
    )
    SELECT doc_id,
           CAST(min(window_id) AS INTEGER) AS seg_start,
           CAST(max(window_id) AS INTEGER) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_windows,
           {o_rnd('avg(rms)', 6)} AS avg_rms
    FROM isl WHERE active = 1
    GROUP BY doc_id, grp
    """


@query("q274_audio_vad_segments", oracle=_q274_oracle())
def q274_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection segments over DECODED audio: q103's
    per-window RMS energies, thresholded at each clip's mean energy,
    merged into contiguous active segments by gaps-and-islands — the
    speech-pipeline preprocessing that cuts silence before
    transcription/feature extraction, run end-to-end from the int16
    PCM BYTES (the decode is under the hash gate; only the synthetic
    waveform is fake, the plumbing is the production path).

    Decode + window features are the q103 mapInPandas kernel (zero
    shuffle); thresholding and islands are two windows over the
    already-tiny (doc, window) table."""
    from pyspark.sql import Window as W

    from ..operators.multimodal import pcm_window_features, synthetic_pcm_payload

    feats = pcm_window_features(
        synthetic_pcm_payload(table(spark, sf_dir, "documents"))
    ).select("doc_id", "window_id", prnd("rms", 6).alias("rms"))
    byd = W.partitionBy("doc_id")
    thr = feats.select(
        "doc_id",
        "window_id",
        "rms",
        (F.col("rms") >= F.avg("rms").over(byd)).cast("int").alias("active"),
    )
    isl = thr.select(
        "doc_id",
        "window_id",
        "rms",
        "active",
        (
            F.col("window_id")
            - F.row_number().over(
                W.partitionBy("doc_id", "active").orderBy("window_id")
            )
        ).alias("grp"),
    )
    return (
        isl.filter(F.col("active") == 1)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("window_id").cast("int").alias("seg_start"),
            F.max("window_id").cast("int").alias("seg_end"),
            F.count("*").cast("long").alias("n_windows"),
            prnd(F.avg("rms"), 6).alias("avg_rms"),
        )
        .drop("grp")
    )
