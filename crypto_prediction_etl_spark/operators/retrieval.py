"""Text-retrieval scoring over a document corpus: TF-IDF / BM25.

The standard lexical-relevance operator a training-data pipeline uses
for corpus triage (query-focused subset selection, quality-weighted
sampling, eval-set retrieval baselines). Spark-first formulation:

- Term frequencies come from one explode + groupBy, but the explode is
  FILTERED to the query's terms before it ever shuffles — the posting
  matrix for the full vocabulary is never materialized. At 100 TB the
  shuffled rows are O(matching doc-term pairs), not O(total tokens).
- Document frequencies aggregate the (already tiny) per-term frame and
  broadcast back; corpus-level scalars (N, avgdl) ride a broadcast
  cross join of a one-row frame. The corpus-side frame never shuffles
  except the one (doc, term) count.
- Everything is built-in expression arithmetic (log/multiply/divide)
  inside whole-stage codegen; no UDFs.

BM25 (Robertson/Sparck Jones, k1=1.2 b=0.75) per document d and query Q:

    score(d) = sum_{t in Q} idf(t) * tf * (k1+1)
                              / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )

which is also the exact form DuckDB can replay for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    pretokenized: bool = False,
) -> DataFrame:
    """(id, dl, n_terms, total_tf, bm25) for documents matching >= 1
    query term. ``bm25`` is the raw double (caller rounds for output).

    ``dl`` is whitespace-token document length; ``n_terms`` the number
    of distinct query terms present; ``total_tf`` their summed counts.

    ``pretokenized=True`` means ``text_col`` already holds the token
    ARRAY (and the caller already spread the scan): the tokenize and
    the spread exchange are skipped — the chunk-retrieval composition
    (q102) would otherwise build one big string per chunk, re-exchange
    it, and split it right back into the tokens it was built from.
    """
    from ..sources.readers import spread_small_scan

    if pretokenized:
        toks = docs.select(F.col(id_col), F.col(text_col).alias("_toks"))
    else:
        toks = spread_small_scan(docs).select(
            F.col(id_col), tokens(text_col).alias("_toks")
        )
    dl = toks.select(F.col(id_col), F.size("_toks").cast("long").alias("dl"))
    # one-row corpus stats frame: exact bigint sum / count, then divide
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select(F.col(id_col), F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        scored.withColumn("_c", contrib)
        .groupBy(id_col)
        .agg(
            F.first("dl").alias("dl"),
            F.count("*").cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.sum("_c").alias("bm25"),
        )
    )
