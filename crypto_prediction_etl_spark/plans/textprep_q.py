"""Corpus-preparation extensions: cross-document segment-level dedup
(CCNet-style), vocabulary/OOV coverage, and edit-distance pair
verification.

These extend the dedup/text families (operators/dedup.py,
operators/text.py) with the remaining granularities a pretraining
pipeline runs: sub-document duplicate removal (Wenzek et al., CCNet —
dedup at paragraph/segment level, not document level), tokenizer
vocabulary coverage (OOV-rate screens before committing a vocab), and
character-level verification of candidate pairs (the final filter
after hash-based candidate generation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import hash64, o_hash64, o_rnd, prnd
from ..operators.text import tokens
from ..sources.readers import table
from .registry import query

_TOKS_SQL = "string_split(lower(text), ' ')"

# ---------------------------------------------------------------------------
# q139 segment-level dedup (CCNet granularity)
# ---------------------------------------------------------------------------

_Q139_W = 8  # tokens per segment (full segments only)


@query(
    "q139_segment_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    seg AS (
      SELECT doc_id,
             {o_hash64(f"array_to_string(toks[g * {_Q139_W} + 1 : g * {_Q139_W} + {_Q139_W}], ' ')")} AS seg_hash
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) // {_Q139_W} - 1)) AS g
        FROM d
      )
    ),
    freq AS (
      SELECT seg_hash, count(DISTINCT doc_id) AS n_docs
      FROM seg GROUP BY seg_hash
    )
    SELECT s.doc_id,
           count(*) AS n_segments,
           count(*) FILTER (WHERE f.n_docs >= 2) AS n_dup_segments,
           {o_rnd('CAST(count(*) FILTER (WHERE f.n_docs >= 2) AS DOUBLE) / count(*)', 6)} AS dup_fraction
    FROM seg s JOIN freq f USING (seg_hash)
    GROUP BY s.doc_id
    """,
)
def q139_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at CCNet granularity: split every doc into
    non-overlapping 8-token segments, hash them, and flag segments that
    appear in >= 2 distinct documents — the op that removes boilerplate
    repeated ACROSS pages without dropping whole documents.

    Two shuffles total, both on the 60-bit segment hash / doc_id: the
    segment table is exploded map-side (no shuffle), the frequency
    count is a partial-aggregated groupBy, and the flag-back is an
    equi-join on the hash. At 100 TB the frequency table is the corpus'
    distinct-segment set — orders of magnitude smaller than the corpus
    (that's the point of deduplication), and a hot segment ("click
    here to subscribe" x 10^9) is ONE row after partial agg, not a
    posting list, because we only need its doc-count, never its pairs.
    """
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= _Q139_W)
    )
    seg = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), (F.size("toks") / _Q139_W).cast("long") - 1
                ),
                lambda g: F.array_join(
                    F.slice(
                        "toks", (g * _Q139_W + 1).cast("int"), _Q139_W
                    ),
                    " ",
                ),
            )
        ).alias("seg_text"),
    ).select("doc_id", hash64("seg_text").alias("seg_hash"))
    freq = seg.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    dup = F.count(F.when(F.col("n_docs") >= 2, 1))
    return (
        seg.join(freq, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            dup.alias("n_dup_segments"),
            prnd(dup.cast("double") / F.count("*"), 6).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# q140 vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

_Q140_V = 256  # vocabulary size


@query(
    "q140_vocab_oov",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    freq AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
    vocab AS (
      SELECT tok FROM freq
      ORDER BY n DESC, tok LIMIT {_Q140_V}
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE v.tok IS NULL) AS n_oov,
           {o_rnd('CAST(count(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE) / count(*)', 6)} AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (tok)
    GROUP BY t.doc_id
    """,
)
def q140_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-256 corpus
    vocabulary (frequency desc, token asc — a total order, so the
    boundary is deterministic), then score every document's
    out-of-vocabulary token rate against it.

    The vocab is SMALL by construction (V entries after one partially
    aggregated token count), so it broadcasts and the per-doc scoring
    pass never shuffles the exploded tokens — at 100 TB the only
    exchange is the token-frequency groupBy, whose partial-agg output
    is bounded by the corpus' distinct-token count, not its size.
    """
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(_Q140_V)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    oov = F.count(F.when(F.col("in_vocab").isNull(), 1))
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            oov.alias("n_oov"),
            prnd(oov.cast("double") / F.count("*"), 6).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q141 edit-distance pair verification
# ---------------------------------------------------------------------------

_Q141_BKT = 50  # n_chars bucket width
_Q141_PFX = 48  # prefix length scored
_Q141_MAX = 24  # max edit distance reported


@query(
    "q141_edit_distance_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars // {_Q141_BKT} AS bkt,
             substr(text, 1, {_Q141_PFX}) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= {_Q141_MAX}
    """,
)
def q141_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup verification: Levenshtein distance on
    48-char prefixes for candidate pairs blocked by (lang, length
    bucket) — the exact-verify stage that follows any hash-based
    candidate generator.

    The blocking join is an EQUI join on (lang, bucket) with the
    ``id_a < id_b`` dedup as a residual predicate — a hash join, never
    a cross product (same discipline as q45/q112). Levenshtein runs
    JVM-side on a FIXED 48-char prefix, so per-pair cost is a constant
    ~2.3k cell DP, not O(doc^2). At 100 TB blocking groups must stay
    bounded: length x lang blocking alone is too coarse there — compose
    with a band hash (as q45 does) so group size is capped by design;
    the operator shape (equi-join + constant-cost verify) is unchanged.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / _Q141_BKT).cast("long").alias("bkt"),
        F.substring("text", 1, _Q141_PFX).alias("pfx"),
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        "bkt",
        F.col("pfx").alias("pfx_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        "lang",
        "bkt",
        F.col("pfx").alias("pfx_b"),
    )
    dist = F.levenshtein("pfx_a", "pfx_b")
    return (
        a.join(b, ["lang", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= _Q141_MAX)
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )
