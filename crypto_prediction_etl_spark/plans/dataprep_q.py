"""Training-data preparation queries: deterministic dataset splitting
and token-budget sequence packing over the documents table.

Both are pure-arithmetic formulations chosen so the SAME decision is
reproducible on any engine (and any rerun at any scale): splits come
from a portable content hash, packing from integer window arithmetic —
no RNG state, no row-order dependence beyond an explicit sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.portable import hash64, o_hash64, o_rnd, prnd
from ..operators.text import tokens
from ..sources.readers import table
from .registry import query

# train/val/test percentile fences over hash64(doc_id) % 100
_SPLIT_TRAIN, _SPLIT_VAL = 80, 90


@query(
    "q73_dataset_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             ({o_hash64('doc_id')}) % 100 AS bucket
      FROM documents
    ),
    s AS (
      SELECT lang,
             CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
                  WHEN bucket < {_SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split,
             doc_id
      FROM h
    ),
    c AS (SELECT lang, split, count(*) AS n_docs, min(doc_id) AS first_doc
          FROM s GROUP BY lang, split),
    t AS (SELECT lang, sum(n_docs) AS lang_total FROM c GROUP BY lang)
    SELECT c.lang, c.split, CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.first_doc AS BIGINT) AS first_doc,
           {o_rnd('CAST(c.n_docs AS DOUBLE) / t.lang_total', 6)} AS share
    FROM c JOIN t USING (lang)
    """,
)
def q73_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment: split =
    percentile fence over a portable content hash (hash64(doc_id) %
    100 -> 80/10/10). Hash-based splitting is the 100 TB-correct
    design — assignment is a per-row expression (no shuffle, no RNG
    sync, no sampleBy state), stable under reruns, repartitions and
    incremental appends; the per-(lang, split) counts here audit the
    stratification. One groupBy is the only shuffle."""
    docs = table(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id")) % 100
    split = (
        F.when(bucket < _SPLIT_TRAIN, "train")
        .when(bucket < _SPLIT_VAL, "val")
        .otherwise("test")
    )
    c = (
        docs.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )
    t = c.groupBy("lang").agg(F.sum("n_docs").alias("lang_total"))
    return c.join(t, "lang").select(
        "lang",
        "split",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("first_doc").cast("long").alias("first_doc"),
        prnd(F.col("n_docs").cast("double") / F.col("lang_total"), 6).alias(
            "share"
        ),
    )


_CAP_PER_CLASS = 60  # max docs kept per language stratum


@query(
    "q76_stratified_cap",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY ({o_hash64('doc_id')}), doc_id) AS INTEGER) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, sample_rank,
           CAST(sample_rank <= {_CAP_PER_CLASS} AS INT) AS kept
    FROM r
    """,
)
def q76_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class downsampling: keep at most N documents per
    language, chosen by portable-hash order (hash64(doc_id) with doc_id
    tie-break) — the class-rebalancing step of a training-data pipeline.

    Hash order instead of RNG makes the sample a pure function of the
    data: stable under reruns, repartitions and appends (a new doc can
    displace at most one ranked doc). One hash-partition + sort per
    stratum is the only shuffle; at 100 TB strata far above the cap are
    first pre-pruned with an approximate per-partition cap (keep local
    top-N before the global window) so the sort input stays bounded."""
    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(hash64(F.col("doc_id")), "doc_id")
    r = docs.select(
        "doc_id", "lang", F.row_number().over(w).alias("sample_rank")
    )
    return r.withColumn(
        "kept", (F.col("sample_rank") <= _CAP_PER_CLASS).cast("int")
    )


_PACK_BUDGET = 2048  # tokens per packed context window


@query(
    "q74_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start_offset
      FROM d
    )
    SELECT doc_id, lang, n_tokens,
           start_offset // {_PACK_BUDGET} AS pack_id,
           start_offset % {_PACK_BUDGET} AS pack_offset
    FROM c
    """,
)
def q74_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for pretraining: concatenate documents
    per language stratum in doc_id order and assign each to the
    2048-token context window its START offset lands in (integer
    window arithmetic — bit-exact on any engine).

    Shuffle pattern: one hash partition + sort per stratum (the window
    spec); token counting itself is map-side. At 100 TB the stratum is
    subdivided by shard (pack_id offset by a shard key) so no single
    sort grows unbounded — the window shape is unchanged."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = d.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return c.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(F.col("start_offset") / _PACK_BUDGET).cast("long").alias("pack_id"),
        (F.col("start_offset") % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )
