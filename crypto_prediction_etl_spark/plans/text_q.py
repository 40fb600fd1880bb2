"""Text-analysis queries over the documents table (language ID, quality
scoring, token counting, fingerprinting) with bit-exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.portable import o_hash64, o_rnd, prnd
from ..operators.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    lang_id,
    lang_scores,
    quality_metrics,
    quality_score,
    tokens,
)
from ..sources.readers import spread_small_scan, table
from .registry import query
from ..pinning import pin_frame, pin_frame_lazy

_TOKS_SQL = "string_split(lower(text), ' ')"


def _in_list(items: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{i}'" for i in items) + ")"


@query(
    "q40_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len({_TOKS_SQL}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_words,
           {o_rnd("CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text)", 6)} AS alpha_ratio,
           {o_rnd("CAST(length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / len(" + _TOKS_SQL + ")", 6)} AS avg_token_len
    FROM documents
    """,
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + character-class ratios (BASELINE north-star:
    text analysis for training-data pipelines). Pure codegen'd
    expressions — no UDF in the scan path."""
    m = quality_metrics("text")
    return spread_small_scan(table(spark, sf_dir, "documents")).select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["n_words"].alias("n_words"),
        prnd(m["alpha_ratio"], 6).alias("alpha_ratio"),
        prnd(m["avg_token_len"], 6).alias("avg_token_len"),
    )


def _lang_oracle() -> str:
    score_cols = ",\n           ".join(
        f"CAST(len(list_filter(toks, t -> t IN {_in_list(LANG_MARKERS[lang])})) AS INTEGER) AS s_{lang}"
        for lang in LANG_PRIORITY
    )
    all_zero = " AND ".join(f"s_{lang} = 0" for lang in LANG_PRIORITY)
    chain = [f"WHEN {all_zero} THEN 'und'"]
    remaining = list(LANG_PRIORITY)
    while remaining:
        lang = remaining.pop(0)
        if remaining:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in remaining)
            chain.append(f"WHEN {cond} THEN '{lang}'")
        else:
            chain.append(f"ELSE '{lang}'")
    case = "CASE " + " ".join(chain) + " END"
    return f"""
    WITH d AS (SELECT doc_id, lang AS lang_actual, {_TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, lang_actual,
           {score_cols}
          FROM d)
    SELECT doc_id, lang_actual, s_en, s_de, s_es, s_fr, s_zh,
           {case} AS lang_pred
    FROM s
    """


@query("q41_lang_id", oracle=_lang_oracle())
def q41_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic priority
    argmax: per-language marker-token counts (array HOFs, zero
    shuffle) and a fixed tie-break order so both engines classify
    identically — the q202 confusion matrix and q292 code-switching
    screens evaluate THIS classifier."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    toks = tokens("text")
    s = lang_scores(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[s[lang].alias(f"s_{lang}") for lang in LANG_PRIORITY],
        lang_id(toks).alias("lang_pred"),
    )


def _quality_score_sql() -> str:
    """The q42 composite-score expression (shared by q390's bias audit)."""
    toks = _TOKS_SQL
    stop = f"len(list_filter({toks}, t -> t IN {_in_list(LANG_MARKERS['en'])}))"
    n_chars = "length(text)"
    n_tokens = f"len({toks})"
    alpha = f"CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / {n_chars}"
    atl = f"CAST({n_chars} - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / {n_tokens}"
    stop_ratio = f"CAST({stop} AS DOUBLE) / {n_tokens}"
    return (
        f"(CASE WHEN {n_tokens} BETWEEN 20 AND 2000 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({stop_ratio}) >= 0.01 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({alpha}) >= 0.6 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({atl}) BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)"
    )


def _quality_oracle() -> str:
    toks = _TOKS_SQL
    stop = f"len(list_filter({toks}, t -> t IN {_in_list(LANG_MARKERS['en'])}))"
    n_chars = "length(text)"
    n_tokens = f"len({toks})"
    alpha = f"CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / {n_chars}"
    atl = f"CAST({n_chars} - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / {n_tokens}"
    stop_ratio = f"CAST({stop} AS DOUBLE) / {n_tokens}"
    score = _quality_score_sql()
    return f"""
    SELECT doc_id,
           {o_rnd(stop_ratio, 6)} AS stopword_ratio,
           {o_rnd(score, 2)} AS quality_score
    FROM documents
    """


@query("q42_quality_score", oracle=_quality_oracle())
def q42_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score (length band, stopword share,
    alpha share, token-length sanity)."""
    m = quality_metrics("text")
    return spread_small_scan(table(spark, sf_dir, "documents")).select(
        "doc_id",
        prnd(m["stopword_ratio"], 6).alias("stopword_ratio"),
        prnd(quality_score(m), 2).alias("quality_score"),
    )


@query(
    "q43_fingerprint_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    canon AS (SELECT fingerprint, min(doc_id) AS canonical_id FROM fp GROUP BY fingerprint)
    SELECT f.doc_id, f.fingerprint, c.canonical_id,
           CAST(f.doc_id <> c.canonical_id AS INT) AS is_duplicate
    FROM fp f JOIN canon c USING (fingerprint)
    """,
)
def q43_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content fingerprint -> hash groupBy -> canonical
    min-id. One shuffle on a 128-bit key at any scale."""
    from ..operators.dedup import exact_dedup

    return exact_dedup(table(spark, sf_dir, "documents"))


_Q47_W = 4  # winnowing window (over 3-gram shingle hashes)

@query(
    "q47_winnowing_fingerprints",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS shs
      FROM d
    ),
    hs AS (SELECT doc_id, list_transform(shs, s -> {o_hash64('s')}) AS hl FROM sh),
    wins AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(hl) > 0 THEN
               list_transform(range(1, greatest(1, len(hl) - {_Q47_W - 1}) + 1),
                              i -> list_aggregate(list_slice(hl, i, i + {_Q47_W - 1}), 'min'))
               ELSE CAST([] AS BIGINT[]) END)) AS fp
      FROM hs
    )
    SELECT doc_id, fp FROM wins
    """,
)
def q47_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style): 3-gram shingle
    hashes -> sliding window-of-4 minima -> distinct kept hashes.

    The whole pipeline is array-domain higher-order functions over one
    row per document — a pure map stage with zero shuffles at any
    scale; only the final explode widens rows. Reference for parity:
    the exact-dedup/fingerprint family (SURVEY §2 LLM-pipeline ops)."""
    from ..functions.portable import hash64
    from ..operators.text import winnow_fingerprints, word_shingles

    docs = table(spark, sf_dir, "documents")
    return (
        spread_small_scan(docs)
        .select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", word_shingles(F.col("_toks"), 3).alias("_sh"))
        .select("doc_id", F.transform("_sh", hash64).alias("_hl"))
        .select(
            "doc_id",
            F.explode(winnow_fingerprints(F.col("_hl"), _Q47_W)).alias("fp"),
        )
    )


_BM25_TERMS = ("hash", "join", "stream", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle() -> str:
    terms = _in_list(_BM25_TERMS)
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks)
           WHERE term IN {terms} GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, dl.dl, tf.tf,
             ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * CAST(dl.dl AS DOUBLE) / stats.avgdl)) AS c
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, CAST(min(dl) AS BIGINT) AS dl,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             {o_rnd('sum(c)', 6)} AS bm25
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, dl, n_terms, total_tf, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank
    FROM agg
    """


@query("q75_bm25_scoring", oracle=_bm25_oracle())
def q75_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical relevance of every document against a fixed query
    (k1=1.2, b=0.75) — the retrieval-scoring op of a corpus-triage
    pipeline. The token explode is filtered to the query's terms BEFORE
    any shuffle, so the full-vocabulary posting matrix never
    materializes; document frequency and corpus stats are broadcast
    one-row/tiny frames. Rank is computed over the ROUNDED score with a
    doc_id tie-break so both engines order identically, and routes
    through operators/globalrank (r6) — a common query term matches
    O(corpus) docs, so even the "matching docs only" frame must never
    sit in a single-task window.
    """
    from ..operators.globalrank import with_global_row_stats
    from ..operators.retrieval import bm25_scores

    docs = table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, list(_BM25_TERMS), _BM25_K1, _BM25_B)
    scored = scored.withColumn("bm25", prnd(F.col("bm25"), 6))
    ranked = with_global_row_stats(
        scored, [F.col("bm25").desc(), "doc_id"], rank_col="rank"
    )
    return ranked.select(
        "doc_id",
        "dl",
        "n_terms",
        "total_tf",
        "bm25",
        "rank",
    )


# deterministic synthetic-PII augmentation: the raw corpus is clean word
# soup, so the detector would only ever see negatives — both engines
# append identical synthetic contacts to a doc_id-keyed subset, giving
# the filter real positives to find (and the redactor real work).
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+"
_URL_RE = "https?://[a-z0-9./]+"
_PHONE_RE = "[0-9]{7,}"


@query(
    "q77_pii_content_filter",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' see https://docs.example.com/p/' || CAST(doc_id AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN ' call 555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
                       ELSE '' END AS t
      FROM documents
    ),
    det AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
             CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS INTEGER) AS n_urls,
             CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
             length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                   '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_len
      FROM aug
    )
    SELECT doc_id, n_emails, n_urls, n_phones,
           CAST(n_emails + n_phones > 0 AS INT) AS pii_flag,
           redacted_len
    FROM det
    """,
)
def q77_pii_content_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/content filtering for corpus curation: regex detectors for
    emails / URLs / long digit runs, a drop-or-keep flag, and redaction
    (replace-then-measure). Patterns are RE2-safe character classes so
    Java regex and DuckDB RE2 match identically. Pure per-row codegen'd
    expression work — zero shuffle at any scale. The synthetic-contact
    augmentation is deterministic on doc_id so both engines construct
    the identical corpus."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com now"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" see https://docs.example.com/p/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" call 555"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
            ),
        ).otherwise(""),
    )
    t = docs.select("doc_id", aug.alias("t"))
    n_emails = F.regexp_count("t", F.lit(_EMAIL_RE))
    n_urls = F.regexp_count("t", F.lit(_URL_RE))
    n_phones = F.regexp_count("t", F.lit(_PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return t.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_phones.alias("n_phones"),
        ((n_emails + n_phones) > 0).cast("int").alias("pii_flag"),
        F.length(redacted).alias("redacted_len"),
    )


@query(
    "q49_bpe_token_segmentation",
    oracle=f"""
    WITH seg AS (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+') AS runs,
             regexp_extract_all(text, '[A-Za-z]+') AS alpha_runs,
             regexp_extract_all(text, '[0-9]+') AS digit_runs
      FROM documents
    )
    SELECT doc_id,
           CAST(len(runs) AS INTEGER) AS n_bpe_tokens,
           CAST(len(alpha_runs) AS INTEGER) AS n_alpha_runs,
           CAST(len(digit_runs) AS INTEGER) AS n_digit_runs,
           {o_rnd("CASE WHEN len(runs) > 0 THEN CAST(len(array_to_string(runs, '')) AS DOUBLE) / len(runs) ELSE 0.0 END", 6)} AS avg_run_len
    FROM seg
    """,
)
def q49_bpe_token_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts: letter/digit/symbol run
    segmentation with an RE2-safe regex both engines evaluate
    identically (the 'token counting: whitespace + BPE-ish regex'
    north-star op). Pure per-row regex — codegen'd, zero shuffle."""
    from ..operators.text import bpe_segments

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    runs = bpe_segments("text")
    alpha = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), F.lit(0))
    digit = F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), F.lit(0))
    n_runs = F.size(runs)
    return docs.select(
        "doc_id",
        n_runs.alias("n_bpe_tokens"),
        F.size(alpha).alias("n_alpha_runs"),
        F.size(digit).alias("n_digit_runs"),
        prnd(
            F.when(
                n_runs > 0,
                F.length(F.array_join(runs, "")).cast("double") / n_runs,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_run_len"),
    )


_Q82_PCT = 0.10  # drop the corpus's bottom decile by quality


def _q82_oracle() -> str:
    # inline the q42 score expression, then fence at its corpus P10
    toks = _TOKS_SQL
    stop = f"len(list_filter({toks}, t -> t IN {_in_list(LANG_MARKERS['en'])}))"
    n_chars = "length(text)"
    n_tokens = f"len({toks})"
    alpha = f"CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / {n_chars}"
    atl = f"CAST({n_chars} - length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / {n_tokens}"
    stop_ratio = f"CAST({stop} AS DOUBLE) / {n_tokens}"
    score = (
        f"(CASE WHEN {n_tokens} BETWEEN 20 AND 2000 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({stop_ratio}) >= 0.01 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({alpha}) >= 0.6 THEN 0.25 ELSE 0.0 END"
        f" + CASE WHEN ({atl}) BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)"
    )
    return f"""
    WITH scored AS (SELECT doc_id, {score} AS q FROM documents),
    fence AS (SELECT quantile_cont(q, {_Q82_PCT}) AS thr FROM scored)
    SELECT doc_id,
           {o_rnd('q', 2)} AS quality_score,
           {o_rnd('thr', 6)} AS threshold,
           CAST(q >= thr AS INT) AS keep
    FROM scored CROSS JOIN fence
    """


@query("q82_quality_fence_filter", oracle=_q82_oracle())
def q82_quality_fence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-fence corpus filtering: score every document (q42's
    composite), compute the corpus P10 as ONE scalar aggregate, and
    keep/flag documents at or above it — the drop-bottom-decile gate of
    a curation pipeline. The fence rides a broadcast one-row cross
    join, so the corpus frame is scanned twice at most (score+agg,
    score+flag) and never shuffled; Spark `percentile` and DuckDB
    `quantile_cont` interpolate identically. At 100 TB the exact
    percentile swaps for `percentile_approx` with a documented error
    bound — the plan shape is unchanged."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    m = quality_metrics("text")
    scored = docs.select("doc_id", quality_score(m).alias("q"))
    fence = scored.agg(F.expr(f"percentile(q, {_Q82_PCT})").alias("thr"))
    return scored.crossJoin(F.broadcast(fence)).select(
        "doc_id",
        prnd(F.col("q"), 2).alias("quality_score"),
        prnd(F.col("thr"), 6).alias("threshold"),
        (F.col("q") >= F.col("thr")).cast("int").alias("keep"),
    )


_CHUNK_LEN, _CHUNK_STRIDE = 64, 48  # 16-token overlap


@query(
    "q83_doc_chunking",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    st AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(1, greatest(len(toks), 1) + 1, {_CHUNK_STRIDE})) AS start_tok
      FROM d
    )
    SELECT doc_id,
           CAST((start_tok - 1) // {_CHUNK_STRIDE} + 1 AS INTEGER) AS chunk_id,
           CAST(start_tok AS INTEGER) AS start_tok,
           CAST(least({_CHUNK_LEN}, n - start_tok + 1) AS INTEGER) AS n_tok,
           md5(array_to_string(list_slice(toks, start_tok, start_tok + {_CHUNK_LEN - 1}), ' ')) AS chunk_md5
    FROM st
    """,
)
def q83_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token chunks, 16-token
    overlap) — the RAG/pretraining splitter. Chunk starts come from a
    per-row `sequence` and the chunk text from an array slice, so the
    whole derivation is array-domain expression work with ZERO shuffle
    at any scale; chunk_id derives arithmetically from the start offset
    (no window function, no ordinality dependence). Chunk content is
    emitted as its md5 so the gate hash-checks full text equality
    without shipping it."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    n = F.size("_toks")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(_CHUNK_STRIDE))
    return (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", "_toks", n.alias("n"), F.explode(starts).alias("start_tok"))
        .select(
            "doc_id",
            (((F.col("start_tok") - 1) / _CHUNK_STRIDE).cast("int") + 1).alias("chunk_id"),
            F.col("start_tok").cast("int").alias("start_tok"),
            F.least(F.lit(_CHUNK_LEN), F.col("n") - F.col("start_tok") + 1)
            .cast("int")
            .alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ", F.slice("_toks", F.col("start_tok"), F.lit(_CHUNK_LEN))
                )
            ).alias("chunk_md5"),
        )
    )


# Gopher-style repetition thresholds: a doc is "repetitive" when its
# duplicate-2-gram share or its top-token share crosses these fences.
_Q86_DUP2, _Q86_TOP1 = 0.2, 0.2


def _q86_oracle() -> str:
    toks = _TOKS_SQL
    g2 = (
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(range(1, len({toks})), "
        f"i -> array_to_string(list_slice({toks}, i, i + 1), ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )
    def dup(g: str) -> str:
        return (
            f"CASE WHEN len({g}) > 0 THEN 1.0 - CAST(len(list_distinct({g})) AS DOUBLE)"
            f" / len({g}) ELSE 0.0 END"
        )
    def top(g: str) -> str:
        return (
            f"CASE WHEN len({g}) > 0 THEN CAST(list_aggregate("
            f"list_transform(list_distinct({g}), x -> len(list_filter({g}, y -> y = x)))"
            f", 'max') AS DOUBLE) / len({g}) ELSE 0.0 END"
        )
    return f"""
    WITH g AS (SELECT doc_id, {toks} AS t1, {g2} AS t2 FROM documents)
    SELECT doc_id,
           CAST(len(t1) AS INTEGER) AS n_tokens,
           CAST(len(t2) AS INTEGER) AS n_2grams,
           {o_rnd(dup('t1'), 6)} AS dup_token_frac,
           {o_rnd(dup('t2'), 6)} AS dup_2gram_frac,
           {o_rnd(top('t1'), 6)} AS top_token_frac,
           {o_rnd(top('t2'), 6)} AS top_2gram_frac,
           CAST(({dup('t2')}) > {_Q86_DUP2} OR ({top('t1')}) > {_Q86_TOP1} AS INT)
             AS repetitive
    FROM g
    """


@query("q86_repetition_signals", oracle=_q86_oracle())
def q86_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signals for corpus curation:
    duplicate-token and duplicate-2-gram fractions plus the share held
    by the single most frequent token / 2-gram, and a keep/drop flag.

    Everything stays in the array domain of ONE row per document — a
    pure map stage, zero shuffle at any corpus size. The top-element
    count is the max run length in the SORTED array via a linear
    ``aggregate`` fold (higher-order lambdas evaluate interpreted in
    Spark, so the naive per-distinct-element filter count is O(n^2)
    per row and measured ~30x slower; the oracle keeps that natural
    formulation — DuckDB vectorizes it — since only results must
    match). This is the repetition-quality gate that runs beside q42's
    length/ratio score in a training-data pipeline."""

    def dup_frac(a):
        return F.when(
            F.size(a) > 0,
            1.0 - F.size(F.array_distinct(a)).cast("double") / F.size(a),
        ).otherwise(0.0)

    def top_frac(a):
        return F.when(
            F.size(a) > 0,
            max_element_frequency(a).cast("double") / F.size(a),
        ).otherwise(0.0)

    from ..operators.text import max_element_frequency, word_shingles

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        tokens("text").alias("t1"),
    ).select("doc_id", "t1", word_shingles(F.col("t1"), 2).alias("t2"))
    raw = base.select(
        "doc_id",
        F.size("t1").alias("n_tokens"),
        F.size("t2").alias("n_2grams"),
        dup_frac(F.col("t1")).alias("_d1"),
        dup_frac(F.col("t2")).alias("_d2"),
        top_frac(F.col("t1")).alias("_t1"),
        top_frac(F.col("t2")).alias("_t2"),
    )
    return raw.select(
        "doc_id",
        "n_tokens",
        "n_2grams",
        prnd(F.col("_d1"), 6).alias("dup_token_frac"),
        prnd(F.col("_d2"), 6).alias("dup_2gram_frac"),
        prnd(F.col("_t1"), 6).alias("top_token_frac"),
        prnd(F.col("_t2"), 6).alias("top_2gram_frac"),
        ((F.col("_d2") > _Q86_DUP2) | (F.col("_t1") > _Q86_TOP1))
        .cast("int")
        .alias("repetitive"),
    )


# benchmark-contamination screen: docs with doc_id % _Q87_MOD == 0 stand
# in for a held-out eval set; every doc is scored by the share of its
# distinct 5-gram hashes that appear anywhere in that set.
_Q87_MOD, _Q87_N, _Q87_FLAG = 97, 5, 0.2


def _q87_oracle() -> str:
    toks = _TOKS_SQL
    return f"""
    WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {_Q87_N}
                  THEN list_transform(range(1, len(toks) - {_Q87_N - 2}),
                                      i -> array_to_string(list_slice(toks, i, i + {_Q87_N - 1}), ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS shs
      FROM d
    ),
    hs AS (SELECT doc_id, list_distinct(list_transform(shs, s -> {o_hash64('s')})) AS hl FROM sh),
    b AS (SELECT DISTINCT unnest(hl) AS g FROM hs WHERE doc_id % {_Q87_MOD} = 0),
    e AS (SELECT doc_id, unnest(hl) AS g FROM hs),
    hit AS (SELECT e.doc_id, count(*) AS n_hit FROM e JOIN b USING (g) GROUP BY e.doc_id),
    j AS (
      SELECT hs.doc_id, len(hl) AS n_grams, coalesce(hit.n_hit, 0) AS n_hit
      FROM hs LEFT JOIN hit ON hs.doc_id = hit.doc_id
    )
    SELECT doc_id,
           CAST(n_grams AS INTEGER) AS n_grams,
           CAST(n_hit AS INTEGER) AS n_hit,
           {o_rnd("CASE WHEN n_grams > 0 THEN CAST(n_hit AS DOUBLE) / n_grams ELSE 0.0 END", 6)} AS contamination,
           CAST(doc_id % {_Q87_MOD} = 0 AS INT) AS is_benchmark,
           CAST(n_grams > 0
                AND CAST(n_hit AS DOUBLE) / n_grams >= {_Q87_FLAG}
                AND doc_id % {_Q87_MOD} <> 0 AS INT) AS flagged
    FROM j
    """


@query("q87_contamination_screen", oracle=_q87_oracle())
def q87_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination screen: treat the doc_id % 97 == 0 slice
    as a held-out benchmark set and score every document by the fraction
    of its distinct 5-gram hashes that occur anywhere in that set.

    Scale shape: the benchmark gram set is DISTINCT over a tiny slice
    and broadcasts; the corpus explodes its grams map-side, inner-joins
    the broadcast set (non-matching grams die before any exchange), and
    only the surviving hits shuffle to a per-doc count — then that
    small hit table broadcasts back onto the one-row-per-doc frame. The
    corpus itself is never shuffled, which is what makes the screen
    viable against a 100 TB crawl."""
    from ..functions.portable import hash64
    from ..operators.text import word_shingles

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    base = (
        docs.select("doc_id", word_shingles(tokens("text"), _Q87_N).alias("_sh"))
        .select(
            "doc_id",
            F.array_distinct(F.transform("_sh", hash64)).alias("hs"),
        )
    )
    bench = (
        base.filter(F.col("doc_id") % _Q87_MOD == 0)
        .select(F.explode("hs").alias("g"))
        .distinct()
    )
    hits = (
        base.select("doc_id", F.explode("hs").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_hit").cast("double") / F.col("n_grams"),
    ).otherwise(0.0)
    return (
        base.select("doc_id", F.size("hs").alias("n_grams"))
        .join(F.broadcast(hits), "doc_id", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("n_hit").cast("int").alias("n_hit"),
            prnd(frac, 6).alias("contamination"),
            (F.col("doc_id") % _Q87_MOD == 0).cast("int").alias("is_benchmark"),
            (
                (frac >= _Q87_FLAG) & (F.col("doc_id") % _Q87_MOD != 0)
            )
            .cast("int")
            .alias("flagged"),
        )
    )


# cross-doc passage overlap via shared winnowing fingerprints: cap the
# posting list per fingerprint (hot boilerplate), require >= 2 shared
# fingerprints, report the top pairs.
_Q89_MAX_DF, _Q89_MIN_SHARED, _Q89_TOPN = 32, 2, 100


def _q89_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS shs
      FROM d
    ),
    hs AS (SELECT doc_id, list_transform(shs, s -> {o_hash64('s')}) AS hl FROM sh),
    wins AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(hl) > 0 THEN
               list_transform(range(1, greatest(1, len(hl) - {_Q47_W - 1}) + 1),
                              i -> list_aggregate(list_slice(hl, i, i + {_Q47_W - 1}), 'min'))
               ELSE CAST([] AS BIGINT[]) END)) AS fp
      FROM hs
    ),
    cnt AS (SELECT fp, count(*) AS df FROM wins GROUP BY fp),
    rare AS (SELECT w.doc_id, w.fp FROM wins w JOIN cnt USING (fp) WHERE df <= {_Q89_MAX_DF}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM rare a JOIN rare b USING (fp)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_Q89_MIN_SHARED}
    ),
    tot AS (SELECT doc_id, count(*) AS n_fp FROM wins GROUP BY doc_id)
    SELECT doc_a, doc_b,
           CAST(n_shared AS INTEGER) AS n_shared,
           {o_rnd('CAST(n_shared AS DOUBLE) / least(ta.n_fp, tb.n_fp)', 6)} AS overlap
    FROM pairs
    JOIN tot ta ON doc_a = ta.doc_id
    JOIN tot tb ON doc_b = tb.doc_id
    ORDER BY n_shared DESC, doc_a, doc_b
    LIMIT {_Q89_TOPN}
    """


@query("q89_passage_overlap", oracle=_q89_oracle())
def q89_passage_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage overlap: two docs that share a run of
    >= w+k-1 = 6 identical tokens are guaranteed to share a winnowing
    fingerprint (q47's invariant), so joining docs on fingerprints
    surfaces shared passages without comparing full texts.

    Scale shape: posting lists are capped at df <= 32 BEFORE the
    self-join (a fingerprint seen in more docs is boilerplate, not a
    passage), so each bucket contributes O(df^2) pairs and one hot
    n-gram can never go quadratic — the same discipline as q44's
    stop-shingle cut and q45's banded join. The final top-N rides a
    deterministic (n_shared, doc_a, doc_b) sort; at 100 TB that global
    sort becomes a per-partition partial top-N + single small merge."""
    from ..functions.portable import hash64
    from ..operators.text import winnow_fingerprints, word_shingles

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    fps = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", word_shingles(F.col("_toks"), 3).alias("_sh"))
        .select("doc_id", F.transform("_sh", hash64).alias("_hl"))
        .select(
            "doc_id",
            F.explode(winnow_fingerprints(F.col("_hl"), _Q47_W)).alias("fp"),
        )
    )
    # eager + lineage-truncated: fps feeds three branches (df counts,
    # the capped self-join, per-doc totals) — a lazy persist lets
    # concurrently-scheduled branches recompute partitions, and a
    # CacheManager entry would substitute into unrelated q47 plans
    fps = fps.transform(pin_frame)
    cnt = fps.groupBy("fp").agg(F.count("*").alias("df"))
    rare = fps.join(cnt.filter(F.col("df") <= _Q89_MAX_DF).select("fp"), "fp")
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _Q89_MIN_SHARED)
    )
    tot = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    return (
        F.broadcast(pairs)
        .join(tot.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("_na")), "doc_a")
        .join(tot.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("_nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("int").alias("n_shared"),
            prnd(
                F.col("n_shared").cast("double") / F.least("_na", "_nb"), 6
            ).alias("overlap"),
        )
        .orderBy(F.col("n_shared").desc(), "doc_a", "doc_b")
        .limit(_Q89_TOPN)
    )


def _q95_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             count(*) AS n_tokens,
             sum(-ln(CAST(v.cnt AS DOUBLE) / CAST(x.total AS DOUBLE))) AS nll
      FROM tok t JOIN vocab v USING (tok) CROSS JOIN tot x
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {o_rnd('nll / n_tokens', 4)} AS avg_nll
    FROM scored
    """


@query("q95_unigram_nll", oracle=_q95_oracle())
def q95_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet-style quality filter):
    train a unigram LM on the corpus itself (token relative
    frequencies), then score every document by average negative
    log-likelihood — documents full of rare junk tokens score high,
    fluent boilerplate scores low; a curation pipeline fences on this
    next to q42's surface heuristics.

    Scale shape: the vocab is one partial-aggregated groupBy over the
    token explosion; scoring joins tokens to vocab on the token key
    (hash join; the vocab of a 100 TB corpus still fits the broadcast
    threshold after min-count pruning) and re-aggregates per doc — the
    same two-shuffle budget as BM25 (q75). ln on exact IEEE ratios is
    engine-portable; the per-doc sum is rounded to 4 decimals, orders
    of magnitude above accumulation-order noise."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    p = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        (-F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))).alias(
            "_nll_tok"
        ),
    )
    return (
        tok.join(p, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_nll_tok").alias("_nll"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            prnd(F.col("_nll") / F.col("n_tokens"), 4).alias("avg_nll"),
        )
    )


_Q102_TOPK = 20


def _q102_oracle() -> str:
    terms = _in_list(_BM25_TERMS)
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    st AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks), 1) + 1, {_CHUNK_STRIDE})) AS start_tok
      FROM d
    ),
    ch AS (
      SELECT doc_id * 1000 + ((start_tok - 1) // {_CHUNK_STRIDE} + 1) AS chunk_key,
             string_split(array_to_string(
               list_slice(toks, start_tok, start_tok + {_CHUNK_LEN - 1}), ' '), ' ') AS t
      FROM st
    ),
    dl AS (SELECT chunk_key, CAST(len(t) AS BIGINT) AS dl FROM ch),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    tf AS (SELECT chunk_key, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT chunk_key, unnest(t) AS term FROM ch)
           WHERE term IN {terms} GROUP BY chunk_key, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.chunk_key, dl.dl, tf.tf,
             ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * CAST(dl.dl AS DOUBLE) / stats.avgdl)) AS c
      FROM tf JOIN dfreq USING (term) JOIN dl USING (chunk_key) CROSS JOIN stats
    ),
    agg AS (
      SELECT chunk_key, CAST(min(dl) AS BIGINT) AS dl,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             {o_rnd('sum(c)', 6)} AS bm25
      FROM scored GROUP BY chunk_key
    ),
    ranked AS (
      SELECT chunk_key // 1000 AS doc_id,
             CAST(chunk_key % 1000 AS INTEGER) AS chunk_id,
             dl, n_terms, total_tf, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, chunk_key) AS INTEGER) AS rank
      FROM agg
    )
    SELECT doc_id, chunk_id, dl, n_terms, total_tf, bm25, rank
    FROM ranked WHERE rank <= {_Q102_TOPK}
    """


@query("q102_chunk_retrieval", oracle=_q102_oracle())
def q102_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval composition: the q83 sliding-window chunker feeds
    the q75 BM25 scorer, returning the top-20 CHUNKS for the query —
    retrieval at passage granularity, which is what a RAG serving
    index actually ranks (a long document with one relevant passage
    should win on that passage, not its diluted whole-document score).

    Plan shape inherits both parents: chunking is array-domain map
    work (zero shuffle), the posting explode is filtered to the
    query's terms before shuffling, corpus stats broadcast, and the
    final top-k is a window over query-matching chunks only. chunk_key
    = doc_id*1000 + chunk_id keeps the composite identity arithmetic
    (no join to recover provenance).

    r12 (guide S2.3 "shuffle keys and metadata instead of payloads",
    S4 column thrift): chunks are passed to the scorer as token-ARRAY
    slices (``pretokenized=True``) — the old shape concat_ws'd every
    64-token chunk into a string, round-robin re-exchanged the chunk
    text (the scorer's own spread), and split it right back into the
    tokens it was built from.  Equivalence: a chunk slice is non-empty
    whenever the doc has >= 1 token (start <= len), tokens carry no
    spaces (they are split products), and concat_ws keeps empty
    strings, so split(concat_ws(slice)) == slice element-for-element —
    dl and every tf are unchanged, and the oracle replays the
    string-rebuild form on identical values."""
    from ..operators.retrieval import bm25_scores

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    n = F.size("_toks")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(_CHUNK_STRIDE))
    chunks = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", "_toks", F.explode(starts).alias("start_tok"))
        .select(
            (
                F.col("doc_id") * 1000
                + ((F.col("start_tok") - 1) / _CHUNK_STRIDE).cast("long")
                + 1
            ).alias("chunk_key"),
            F.slice("_toks", F.col("start_tok"), F.lit(_CHUNK_LEN)).alias(
                "_ctoks"
            ),
        )
    )
    scored = bm25_scores(
        chunks, list(_BM25_TERMS), _BM25_K1, _BM25_B, id_col="chunk_key",
        text_col="_ctoks", pretokenized=True,
    ).withColumn("bm25", prnd(F.col("bm25"), 6))
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("bm25").desc(), "chunk_key")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _Q102_TOPK)
        .select(
            (F.col("chunk_key") / 1000).cast("long").alias("doc_id"),
            (F.col("chunk_key") % 1000).cast("int").alias("chunk_id"),
            "dl",
            "n_terms",
            "total_tf",
            "bm25",
            F.col("rank").cast("int").alias("rank"),
        )
    )


_Q104_MIN_COUNT, _Q104_TOPK = 5, 50


def _q104_oracle() -> str:
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok
    ),
    nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
    bi AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab
      FROM (
        SELECT unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)),
                        i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                 ELSE CAST([] AS VARCHAR[]) END) AS bigram
        FROM d)
      GROUP BY bigram HAVING count(*) >= {_Q104_MIN_COUNT}
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM
           (SELECT unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)),
                        i -> array_to_string(list_slice(toks, i, i + 1), ' '))
                 ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM d)),
    scored AS (
      SELECT b.bigram, b.c_ab, ua.c AS c_a, ub.c AS c_b,
             ln((CAST(b.c_ab AS DOUBLE) / CAST(nb.n_bi AS DOUBLE))
                / ((CAST(ua.c AS DOUBLE) / CAST(nu.n_uni AS DOUBLE))
                   * (CAST(ub.c AS DOUBLE) / CAST(nu.n_uni AS DOUBLE)))) AS pmi
      FROM bi b
      JOIN uni ua ON ua.tok = split_part(b.bigram, ' ', 1)
      JOIN uni ub ON ub.tok = split_part(b.bigram, ' ', 2)
      CROSS JOIN nu CROSS JOIN nb
    )
    SELECT bigram, c_ab, c_a, c_b,
           {o_rnd('pmi', 6)} AS pmi,
           CAST(row_number() OVER (ORDER BY {o_rnd('pmi', 6)} DESC, bigram) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {_Q104_TOPK}
    """


@query("q104_pmi_collocations", oracle=_q104_oracle())
def q104_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: top bigrams by pointwise mutual
    information (min count 5) — the phrase-detection pass a tokenizer/
    vocab pipeline runs to promote multi-word units, and a direct
    reuse of the 2-gram shingle machinery.

    Shuffle budget: one groupBy for unigrams, one for bigrams; the
    count-cut bigram table joins unigram counts on the word key (at
    scale the unigram table prunes to words appearing in surviving
    bigrams before broadcasting); corpus totals are one-row broadcast
    frames. The final top-k windows over count-cut bigrams only."""
    from ..operators.text import word_shingles

    d = spread_small_scan(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens("text").alias("_toks")
    )
    uni = (
        d.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    nu = uni.agg(F.sum("c").alias("n_uni"))
    bi_all = d.select(
        F.explode(word_shingles(F.col("_toks"), 2)).alias("bigram")
    )
    nb = bi_all.agg(F.count("*").alias("n_bi"))
    bi = (
        bi_all.groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _Q104_MIN_COUNT)
    )
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bi.withColumn("_w1", parts.getItem(0))
        .withColumn("_w2", F.concat_ws(" ", F.slice(parts, 2, 100000)))
        .join(uni.select(F.col("tok").alias("_w1"), F.col("c").alias("c_a")), "_w1")
        .join(uni.select(F.col("tok").alias("_w2"), F.col("c").alias("c_b")), "_w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .withColumn(
            "pmi",
            F.log(
                (F.col("c_ab").cast("double") / F.col("n_bi").cast("double"))
                / (
                    (F.col("c_a").cast("double") / F.col("n_uni").cast("double"))
                    * (F.col("c_b").cast("double") / F.col("n_uni").cast("double"))
                )
            ),
        )
    )
    from pyspark.sql import Window as W

    w = W.orderBy(prnd(F.col("pmi"), 6).desc(), "bigram")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _Q104_TOPK)
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            prnd(F.col("pmi"), 6).alias("pmi"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


_Q109_PROBES = ("the", "hash", "vector", "zzz_absent_token")


def _q109_oracle() -> str:
    from ..operators.sketches import CMS_ROWS, CMS_WIDTH

    probe_vals = ", ".join(f"('{t}')" for t in _Q109_PROBES)
    def bkt(salt, expr):
        inner = "'cms" + str(salt) + ":' || " + expr
        return "(" + o_hash64(inner) + ") % " + str(CMS_WIDTH)
    cell_rows = " UNION ALL ".join(
        f"SELECT {r} AS row_id, {bkt(r, 'tok')} AS bkt FROM tok"
        for r in range(CMS_ROWS)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT token, {r} AS row_id, {bkt(r, 'token')} AS bkt FROM probes"
        for r in range(CMS_ROWS)
    )
    return f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    cells AS ({cell_rows}),
    sketch AS (
      SELECT row_id, bkt, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row_id, bkt
    ),
    probes(token) AS (VALUES {probe_vals}),
    pc AS ({probe_cells}),
    est AS (
      SELECT pc.token,
             CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_estimate
      FROM pc LEFT JOIN sketch s USING (row_id, bkt)
      GROUP BY pc.token
    ),
    exact AS (
      SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_exact
      FROM tok WHERE tok IN {_in_list(_Q109_PROBES)} GROUP BY tok
    )
    SELECT e.token, CAST(coalesce(x.n_exact, 0) AS BIGINT) AS n_exact,
           e.cms_estimate
    FROM est e LEFT JOIN exact x USING (token)
    """


@query("q109_count_min_sketch", oracle=_q109_oracle())
def q109_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream (4 salted-md5
    hash rows x 256 buckets), probed for a fixed token set next to
    exact counts. Counter cells are exact integer sums, so the whole
    sketch — and the min-over-rows estimates — is bit-identical on any
    engine and any partitioning, and shard sketches merge by cell-wise
    ADDITION (the counting analog of q91's register-max merge).
    Estimates can only overcount (collisions), never undercount; the
    absent-token probe documents the collision floor."""
    from ..operators.sketches import cms_token_counts

    toks = spread_small_scan(table(spark, sf_dir, "documents")).select(
        F.explode(tokens("text")).alias("tok")
    )
    return cms_token_counts(toks, "tok", list(_Q109_PROBES))


# character-entropy quality gate: docs whose alphanumeric character
# distribution carries fewer bits than this are gibberish/repetition.
_Q128_LOW_BITS = 3.0


def _q128_oracle() -> str:
    return f"""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS ch
      FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    ),
    ent AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS INTEGER) AS n_distinct,
             sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS term_sum
      FROM counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(e.n, 0) AS INTEGER) AS n_alnum,
           coalesce(e.n_distinct, 0) AS n_distinct_chars,
           {o_rnd("CASE WHEN e.n > 0 THEN log2(CAST(e.n AS DOUBLE)) - e.term_sum / CAST(e.n AS DOUBLE) ELSE 0.0 END", 6)} AS char_entropy_bits,
           CAST(coalesce(CASE WHEN e.n > 0 THEN log2(CAST(e.n AS DOUBLE)) - e.term_sum / CAST(e.n AS DOUBLE) ELSE 0.0 END, 0.0) < {_Q128_LOW_BITS} AS INT) AS low_entropy
    FROM documents d LEFT JOIN ent e USING (doc_id)
    """


@query("q128_char_entropy", oracle=_q128_oracle())
def q128_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's alphanumeric character
    distribution — the classic cheap gibberish/boilerplate screen that
    runs beside q42's ratio score and q86's repetition gate in a
    training-data pipeline (low-entropy text is keyboard mash, padding,
    or single-char repetition; English prose sits near 4-4.2 bits).

    The whole computation stays in the array domain of one row per
    document: frequencies are run lengths in the SORTED char array, and
    ``sum c_i*log2(c_i)`` folds over them in one linear ``aggregate``
    pass (``operators.text.entropy_term_sum``) — a pure map stage, zero
    shuffle at any corpus size, where the per-(doc, char) groupBy the
    oracle uses would shuffle ~n_chars rows. Entropy follows as
    ``log2(n) - term_sum/n``."""
    from ..operators.text import entropy_term_sum

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    chars = F.expr("regexp_extract_all(lower(text), '[a-z0-9]', 0)")
    base = docs.select(
        "doc_id",
        F.size(chars).alias("n_alnum"),
        F.size(F.array_distinct(chars)).alias("n_distinct_chars"),
        entropy_term_sum(chars).alias("_term_sum"),
    )
    ent = F.when(
        F.col("n_alnum") > 0,
        F.log2(F.col("n_alnum").cast("double"))
        - F.col("_term_sum") / F.col("n_alnum").cast("double"),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        "n_alnum",
        "n_distinct_chars",
        prnd(ent, 6).alias("char_entropy_bits"),
        (ent < _Q128_LOW_BITS).cast("int").alias("low_entropy"),
    )


# one BPE merge iteration: the corpus-wide adjacent-character-pair
# frequency scan that picks the next merge candidate.
_Q133_TOP = 20


def _q133_oracle() -> str:
    return """
    WITH words AS (
      SELECT unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                w -> length(w) >= 2)) AS w
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
      FROM words
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """


@query("q133_bpe_merge_candidates", oracle=_q133_oracle())
def q133_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge iteration: count every adjacent symbol
    pair inside alphanumeric word runs across the corpus and emit the
    top merge candidates (count desc, pair asc — the deterministic
    pick).  Pair extraction stays in the array domain per document
    (regex word runs -> per-word substring pairs -> flatten), so the
    only shuffle is the partial-agg groupBy over the ~1.3k distinct
    pairs — at 100 TB each task counts its own split and ships a tiny
    partial map, the same shape q104's PMI scan uses.  Iterating this
    query with a merge table IS the BPE training loop; one step is
    enough to hash-check the scan."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    pairs = F.expr(
        "flatten(transform("
        " filter(regexp_extract_all(lower(text), '[a-z0-9]+', 0),"
        "        w -> length(w) >= 2),"
        " w -> transform(sequence(1, length(w) - 1),"
        "                i -> substring(w, i, 2))))"
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_Q133_TOP)
    )


# ---------------------------------------------------------------------------
# q229 CUBE corpus profile (all four grouping levels in one pass)
# ---------------------------------------------------------------------------


@query(
    "q229_cube_profile",
    oracle=f"""
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS lvl,
           CAST(count(*) AS BIGINT) AS n_docs,
           {o_rnd('avg(CAST(n_chars AS DOUBLE))', 4)} AS avg_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def q229_cube_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile at every (lang, source) grouping level in one
    pass — CUBE completes the multi-level-aggregation family next to
    q134's ROLLUP (which only nests prefixes; CUBE also emits the
    source-only margin a rollup skips). One Expand + one partial-agg
    groupBy; at scale this is 4x the group cardinality, never 4 scans.
    Level ids and 'ALL' coalescing mirror DuckDB's GROUPING bits so
    the hash gate covers the grouping metadata too."""
    d = table(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count("*").cast("long").alias("n_docs"),
            prnd(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "lvl",
            "n_docs",
            "avg_chars",
            "max_chars",
        )
    )


# ---------------------------------------------------------------------------
# q251 unpivot / melt (wide profile -> long metric rows)
# ---------------------------------------------------------------------------


@query(
    "q251_unpivot_profile",
    oracle=f"""
    WITH wide AS (
      SELECT lang,
             CAST(count(*) AS DOUBLE) AS n_docs,
             {o_rnd('avg(CAST(n_chars AS DOUBLE))', 4)} AS avg_chars,
             CAST(max(n_chars) AS DOUBLE) AS max_chars
      FROM documents GROUP BY lang
    )
    UNPIVOT wide ON n_docs, avg_chars, max_chars
    INTO NAME metric VALUE value
    """,
)
def q251_unpivot_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of q135's pivot, completing the
    reshaping pair: a wide per-language profile (n_docs, avg_chars,
    max_chars) melts into tidy (lang, metric, value) rows, the form
    BI tools and chart layers consume and the form UNION-driven
    metric stores ingest.

    Spark's native unpivot (Expand under the hood) emits all metric
    rows in ONE pass over the already-aggregated wide table — no
    per-metric scans, no shuffle beyond the original groupBy; metrics
    share one double-typed value column (the unpivot contract)."""
    d = table(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        prnd(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    return wide.unpivot(
        ids=["lang"],
        values=["n_docs", "avg_chars", "max_chars"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# q256 mutual information between categorical columns
# ---------------------------------------------------------------------------


@query(
    "q256_mutual_information",
    oracle=f"""
    WITH j AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS nxy
      FROM documents GROUP BY lang, source
    ),
    t AS (SELECT sum(nxy) AS n FROM j),
    mx AS (SELECT lang, sum(nxy) AS nx FROM j GROUP BY lang),
    my AS (SELECT source, sum(nxy) AS ny FROM j GROUP BY source),
    mi AS (
      SELECT sum(j.nxy / t.n * ln(j.nxy * t.n / (mx.nx * my.ny))) AS mi_nats
      FROM j JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN t
    ),
    hx AS (SELECT -sum(nx / t.n * ln(nx / t.n)) AS h FROM mx CROSS JOIN t),
    hy AS (SELECT -sum(ny / t.n * ln(ny / t.n)) AS h FROM my CROSS JOIN t)
    SELECT {o_rnd('mi.mi_nats', 6)} AS mi_nats,
           {o_rnd('hx.h', 6)} AS h_lang,
           {o_rnd('hy.h', 6)} AS h_source,
           {o_rnd('CASE WHEN least(hx.h, hy.h) > 0 THEN mi.mi_nats / least(hx.h, hy.h) ELSE 0.0 END', 6)} AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def q256_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (lang,
    source), plus both marginal entropies and the min-entropy
    normalized MI — the dependence measure that catches associations
    chi-square significance alone doesn't quantify (q208 tests; this
    MEASURES, in nats). In a corpus pipeline: high lang-source NMI
    means per-source sampling silently reweights languages.

    Plug-in estimator over the CONTINGENCY table: one joint groupBy
    (the only pass over data), marginals and entropies over the tiny
    joint table, one scalar row out."""
    d = table(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("nxy")
    )
    t = j.agg(F.sum("nxy").alias("n"))
    mx = j.groupBy("lang").agg(F.sum("nxy").alias("nx"))
    my = j.groupBy("source").agg(F.sum("nxy").alias("ny"))
    mi = (
        j.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(t))
        .agg(
            F.sum(
                F.col("nxy")
                / F.col("n")
                * F.log(
                    F.col("nxy") * F.col("n") / (F.col("nx") * F.col("ny"))
                )
            ).alias("mi_nats")
        )
    )
    hx = mx.crossJoin(F.broadcast(t)).agg(
        (-F.sum(F.col("nx") / F.col("n") * F.log(F.col("nx") / F.col("n")))).alias(
            "h_lang"
        )
    )
    hy = my.crossJoin(F.broadcast(t)).agg(
        (-F.sum(F.col("ny") / F.col("n") * F.log(F.col("ny") / F.col("n")))).alias(
            "h_source"
        )
    )
    out = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    minh = F.least("h_lang", "h_source")
    return out.select(
        prnd("mi_nats", 6).alias("mi_nats"),
        prnd("h_lang", 6).alias("h_lang"),
        prnd("h_source", 6).alias("h_source"),
        prnd(
            F.when(minh > 0, F.col("mi_nats") / minh).otherwise(0.0), 6
        ).alias("nmi"),
    )


# ---------------------------------------------------------------------------
# q264 Zipf-law fit of the token frequency spectrum
# ---------------------------------------------------------------------------


@query(
    "q264_zipf_fit",
    oracle=f"""
    WITH tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rnk
      FROM tf
    ),
    pts AS (
      SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
      FROM ranked
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx,
             sum(y * y) AS syy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           {o_rnd('(sxy - sx * sy / n) / (sxx - sx * sx / n)', 6)} AS zipf_slope,
           {o_rnd('(sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n', 6)} AS intercept,
           {o_rnd('(sxy - sx * sy / n) * (sxy - sx * sy / n) / ((sxx - sx * sx / n) * (syy - sy * sy / n))', 6)} AS r2
    FROM s
    """,
)
def q264_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token spectrum: OLS of log-frequency
    on log-rank (slope ~ -1 for natural language; much flatter or
    steeper flags synthetic, templated, or truncated text) with the
    fit R^2 as the health score — the one-row corpus fingerprint a
    data-quality dashboard tracks release-over-release.

    One token-explode groupBy (the only heavy pass), one global rank
    over the vocabulary routed through operators/globalrank (range
    exchange + local rank + O(partitions) offsets — Heaps' law keeps
    the type table sub-linear but still unbounded, so it never sits
    in a single-task window; r6 routing), then algebraic OLS sums —
    the q216 sufficient-stats law applied to the frequency spectrum
    itself."""
    d = table(spark, sf_dir, "documents")
    from ..operators.globalrank import with_global_row_stats

    tf = (
        spread_small_scan(d)
        .select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    ranked = with_global_row_stats(
        tf, [F.col("freq").desc(), "term"], rank_col="rnk"
    ).select("freq", "rnk")
    pts = ranked.select(
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        prnd(slope, 6).alias("zipf_slope"),
        prnd(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
        prnd(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            ),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q292 code-switching / language-mix detection per document
# ---------------------------------------------------------------------------


def _q292_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    scores = ",\n             ".join(
        f"len(list_filter(toks, t -> t IN {_in_list(LANG_MARKERS[lang])})) AS s_{lang}"
        for lang in langs
    )
    nonzero = " + ".join(
        f"CASE WHEN s_{lang} > 0 THEN 1 ELSE 0 END" for lang in langs
    )
    total = " + ".join(f"s_{lang}" for lang in langs)
    top = f"greatest({', '.join(f's_{lang}' for lang in langs)})"
    return f"""
    WITH d AS (SELECT doc_id, lang AS label, {_TOKS_SQL} AS toks FROM documents),
    sc AS (
      SELECT doc_id, label,
             {scores}
      FROM d
    )
    SELECT doc_id, label,
           CAST(({nonzero}) AS INTEGER) AS n_langs_hit,
           CAST(({total}) AS BIGINT) AS n_marker_toks,
           {o_rnd(f'CASE WHEN ({total}) > 0 THEN 1.0 - CAST({top} AS DOUBLE) / ({total}) ELSE 0.0 END', 6)} AS mix_score,
           CAST(({nonzero}) >= 2 AND ({total}) >= 4 AS INT) AS is_code_switched
    FROM sc
    """


@query("q292_code_switching", oracle=_q292_oracle())
def q292_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching detection: documents whose marker tokens hit
    TWO OR MORE language inventories (with a minimum marker count),
    scored by the share of markers OUTSIDE the dominant language —
    the corpus screen that catches mixed-language pages a single
    argmax label (q41) silently mislabels, which matters because
    mixed documents poison per-language training mixtures (q88).

    Same marker machinery as the q41 classifier, evaluated per
    document as pure array HOFs — zero shuffle, one scan."""
    d = table(spark, sf_dir, "documents")
    langs = sorted(LANG_MARKERS)
    toks = tokens("text")
    base = spread_small_scan(d).select(
        "doc_id", F.col("lang").alias("label"), toks.alias("toks")
    )
    def _marker_filter(markers):
        return lambda t: F.array_contains(markers, t)

    for lang in langs:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        base = base.withColumn(
            f"s_{lang}",
            F.size(F.filter(F.col("toks"), _marker_filter(markers))),
        )
    nonzero = None
    total = None
    for lang in langs:
        nz = (F.col(f"s_{lang}") > 0).cast("int")
        nonzero = nz if nonzero is None else nonzero + nz
        total = (
            F.col(f"s_{lang}")
            if total is None
            else total + F.col(f"s_{lang}")
        )
    top = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    return base.select(
        "doc_id",
        "label",
        nonzero.cast("int").alias("n_langs_hit"),
        total.cast("long").alias("n_marker_toks"),
        prnd(
            F.when(
                total > 0, 1.0 - top.cast("double") / total
            ).otherwise(0.0),
            6,
        ).alias("mix_score"),
        ((nonzero >= 2) & (total >= 4)).cast("int").alias(
            "is_code_switched"
        ),
    )


# ---------------------------------------------------------------------------
# q293 data-contract fill rates per source
# ---------------------------------------------------------------------------

_Q293_MIN_CHARS = 40  # contract: documents shorter than this are "thin"


@query(
    "q293_contract_fill_rates",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {o_rnd("avg(CASE WHEN text IS NULL OR text = '' THEN 1.0 ELSE 0.0 END)", 6)} AS empty_text_rate,
           {o_rnd("avg(CASE WHEN lang IS NULL OR lang = '' THEN 1.0 ELSE 0.0 END)", 6)} AS missing_lang_rate,
           {o_rnd(f'avg(CASE WHEN n_chars < {_Q293_MIN_CHARS} THEN 1.0 ELSE 0.0 END)', 6)} AS thin_doc_rate,
           {o_rnd('avg(CASE WHEN CAST(length(text) AS BIGINT) = n_chars THEN 1.0 ELSE 0.0 END)', 6)} AS n_chars_consistency
    FROM documents GROUP BY source
    """,
)
def q293_contract_fill_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract monitor per SOURCE: empty-text rate, missing
    language tags, thin-document share, and the n_chars-vs-length
    consistency check — the per-supplier scorecard that turns 'the
    corpus got worse' into 'source X started shipping empty bodies
    on Tuesday' (q199 profiles columns globally; contracts are
    enforced per PRODUCER).

    One conditional aggregate per source — each contract clause is a
    CASE expression riding the same partial-agg groupBy."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        prnd(
            F.avg(
                F.when(
                    F.col("text").isNull() | (F.col("text") == ""), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("empty_text_rate"),
        prnd(
            F.avg(
                F.when(
                    F.col("lang").isNull() | (F.col("lang") == ""), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("missing_lang_rate"),
        prnd(
            F.avg(
                F.when(F.col("n_chars") < _Q293_MIN_CHARS, 1.0).otherwise(0.0)
            ),
            6,
        ).alias("thin_doc_rate"),
        prnd(
            F.avg(
                F.when(
                    F.length("text").cast("long") == F.col("n_chars"), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("n_chars_consistency"),
    )


# ---------------------------------------------------------------------------
# q305 term burstiness (Church-Gale: within-document clumping)
# ---------------------------------------------------------------------------

_Q305_MIN_DF = 5


@query(
    "q305_term_burstiness",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    s AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(f) AS BIGINT) AS cf,
             avg(CAST(f AS DOUBLE)) AS mean_in_doc
      FROM tf GROUP BY term
      HAVING count(*) >= {_Q305_MIN_DF}
    )
    SELECT term, df, cf,
           {o_rnd('CAST(cf AS DOUBLE) / df', 6)} AS burstiness,
           CAST(CAST(cf AS DOUBLE) / df > 1.5 AS INT) AS is_bursty
    FROM s
    """,
)
def q305_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995): collection frequency
    over document frequency — once a word appears in a document it
    tends to appear AGAIN (content words clump; function words
    spread), so cf/df far above 1 marks topical terms and cf/df ~ 1
    marks glue. The corpus-linguistics statistic behind stopword
    induction and q201's keyword quality, and the per-TERM twin of
    q213's temporal Fano factor.

    One token-explode groupBy to (doc, term), one groupBy to terms
    with a min-df support cut — both partial-agg friendly."""
    d = table(spark, sf_dir, "documents")
    tf = (
        spread_small_scan(d)
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("f"))
    )
    s = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("f").cast("long").alias("cf"),
    ).filter(F.col("df") >= _Q305_MIN_DF)
    b = F.col("cf").cast("double") / F.col("df")
    return s.select(
        "term",
        "df",
        "cf",
        prnd(b, 6).alias("burstiness"),
        (b > 1.5).cast("int").alias("is_bursty"),
    )


# ---------------------------------------------------------------------------
# q320 hashed linear quality classifier (fasttext-style plumbing)
# ---------------------------------------------------------------------------

_Q320_BUCKETS = 512
_Q320_THRESH = 0.5


def _q320_oracle() -> str:
    from ..functions.portable import o_hash64

    bkt = f"({o_hash64('tok')}) % {_Q320_BUCKETS}"
    wkey = "'w:' || CAST(bkt AS VARCHAR)"
    wexpr = f"(({o_hash64(wkey)}) % 2001 - 1000) / 1000.0"
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    feats AS (
      SELECT doc_id, {bkt} AS bkt, count(*) AS cnt
      FROM toks GROUP BY doc_id, {bkt}
    ),
    scored AS (
      SELECT doc_id,
             sum(cnt * ({wexpr})) / sum(cnt) AS score,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS INTEGER) AS n_active_buckets
      FROM feats GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_active_buckets,
           {o_rnd('score', 6)} AS score,
           {o_rnd('1.0 / (1.0 + exp(-score))', 6)} AS prob_keep,
           CAST({o_rnd('1.0 / (1.0 + exp(-score))', 6)} >= {_Q320_THRESH} AS INT)
             AS keep
    FROM scored
    """


@query("q320_hashed_linear_classifier", oracle=_q320_oracle())
def q320_hashed_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering plumbing (the fastText/CCNet slot
    in an LLM curation pipeline): bag-of-words hashed to 512 feature
    buckets, scored by a linear model, squashed through a sigmoid,
    thresholded into a keep decision. No ML runtime exists in this
    container, so the weight vector is a deterministic function of the
    bucket id (md5 -> [-1, 1]) — the SERVING path (feature hashing,
    sparse dot product, calibration, thresholding) is real and
    hash-checked end-to-end; training would only replace the weight
    literal source. The keep flag thresholds the GRID-ROUNDED
    probability so the decision is identical on both engines even at
    the boundary.

    Scale: feature hashing is a map; the sparse dot product is one
    (doc, bucket) partial aggregation + one doc aggregation — the
    same two-shuffle shape as plain token counting, independent of
    model width (weights derive per-row from the bucket id; a learned
    model would broadcast its 512 floats)."""
    from ..functions.portable import hash64

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    feats = toks.select(
        "doc_id", (hash64(F.col("tok")) % _Q320_BUCKETS).alias("bkt")
    ).groupBy("doc_id", "bkt").agg(F.count("*").alias("cnt"))
    wcol = (
        hash64(F.concat(F.lit("w:"), F.col("bkt").cast("string"))) % 2001
        - 1000
    ) / 1000.0
    scored = feats.groupBy("doc_id").agg(
        (F.sum(F.col("cnt") * wcol) / F.sum("cnt")).alias("score"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("int").alias("n_active_buckets"),
    )
    prob = prnd(1.0 / (1.0 + F.exp(-F.col("score"))), 6)
    return scored.select(
        "doc_id",
        "n_tokens",
        "n_active_buckets",
        prnd(F.col("score"), 6).alias("score"),
        prob.alias("prob_keep"),
        (prob >= _Q320_THRESH).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# q328 soft-dedup sampling weights
# ---------------------------------------------------------------------------


@query(
    "q328_soft_dedup_weights",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    grp AS (
      SELECT fingerprint, count(*) AS n_copies
      FROM fp GROUP BY fingerprint
    ),
    wts AS (
      SELECT f.doc_id, g.n_copies,
             1.0 / g.n_copies AS w_uniform,
             1.0 / sqrt(CAST(g.n_copies AS DOUBLE)) AS w_sqrt
      FROM fp f JOIN grp g USING (fingerprint)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_copies AS BIGINT) AS n_copies,
           floor(w_uniform * 1000000.0 + 0.5001) / 1000000.0 AS w_uniform,
           floor(w_sqrt * 1000000.0 + 0.5001) / 1000000.0 AS w_sqrt
    FROM wts
    """,
)
def q328_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING exact duplicates (q43),
    downweight them — every copy of a document repeated n times gets
    sampling weight 1/n (sum over copies = one effective document) or
    the gentler 1/sqrt(n) (repeated text is partially informative —
    the convention several LLM corpus recipes use for
    near-boilerplate). Training-data samplers consume these weights
    directly; the hard-dedup keep/drop decision becomes the w=1/n,
    keep-all special case.

    Shape: the q43 fingerprint groupBy (one 128-bit-key shuffle) plus
    a broadcast-able size join — no new scale surface."""
    docs = table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("fingerprint"),
    )
    grp = fp.groupBy("fingerprint").agg(F.count("*").alias("n_copies"))
    return fp.join(grp, "fingerprint").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_copies").cast("long").alias("n_copies"),
        prnd(1.0 / F.col("n_copies"), 6).alias("w_uniform"),
        prnd(1.0 / F.sqrt(F.col("n_copies").cast("double")), 6).alias("w_sqrt"),
    )


# ---------------------------------------------------------------------------
# q334 classifier threshold sweep (precision / recall / F1 table)
# ---------------------------------------------------------------------------

_Q334_THRESHOLDS = (0.45, 0.475, 0.5, 0.525, 0.55)


def _q334_oracle() -> str:
    from ..functions.portable import o_hash64

    bkt = f"({o_hash64('tok')}) % {_Q320_BUCKETS}"
    wkey = "'w:' || CAST(bkt AS VARCHAR)"
    wexpr = f"(({o_hash64(wkey)}) % 2001 - 1000) / 1000.0"
    th_rows = ", ".join(f"({t!r})" for t in _Q334_THRESHOLDS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    lbl AS (
      SELECT doc_id,
             CAST(max(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS INT) AS y
      FROM toks GROUP BY doc_id
    ),
    feats AS (
      SELECT doc_id, {bkt} AS bkt, count(*) AS cnt
      FROM toks GROUP BY doc_id, {bkt}
    ),
    scored AS (
      SELECT doc_id,
             {o_rnd('1.0 / (1.0 + exp(-(sum(cnt * (' + wexpr + ')) / sum(cnt))))', 6)} AS prob
      FROM feats GROUP BY doc_id
    ),
    th(t) AS (VALUES {th_rows}),
    cells AS (
      SELECT th.t,
             sum(CASE WHEN s.prob >= th.t AND l.y = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN s.prob >= th.t AND l.y = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN s.prob < th.t AND l.y = 1 THEN 1 ELSE 0 END) AS fn
      FROM scored s JOIN lbl l USING (doc_id) CROSS JOIN th
      GROUP BY th.t
    )
    SELECT {o_rnd('t', 6)} AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           {o_rnd('CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END', 6)} AS precision_,
           {o_rnd('CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END', 6)} AS recall_,
           {o_rnd('CASE WHEN 2 * tp + fp + fn > 0 THEN 2.0 * tp / (2 * tp + fp + fn) END', 6)} AS f1
    FROM cells
    """


@query("q334_threshold_sweep", oracle=_q334_oracle())
def q334_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection for the q320 quality classifier: a
    precision / recall / F1 table over a threshold grid against a
    deterministic ground-truth label (documents containing the probe
    token) — the sweep every curation pipeline runs to pick its keep
    cut (q247's AUC summarizes ranking quality; shipping needs ONE
    threshold, chosen from exactly this table). Probabilities are
    grid-rounded before comparison so both engines make identical
    boundary decisions.

    Shape: scores and labels are each one aggregation over the token
    explode; the sweep is a broadcast cross join against a 5-row
    literal grid — cost is linear in documents, constant in grid."""
    from ..functions.portable import hash64

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    # r12 (guide S2.3, plan_dup_audit find): the label and feature
    # aggregations both consumed the token explode, so the corpus
    # tokenize ran twice.  One (doc, bkt)-grain aggregation now
    # carries BOTH the hashed-feature count and the ground-truth flag
    # (max over the bucket's tokens; the probe token always lands in
    # one bucket, and max-of-max over buckets == max over tokens), so
    # a single tokenize pass and a single position-grain shuffle feed
    # one doc-grain aggregation producing prob AND y together.
    g = toks.select(
        "doc_id",
        (hash64(F.col("tok")) % _Q320_BUCKETS).alias("bkt"),
        (F.col("tok") == "join").cast("int").alias("is_probe"),
    ).groupBy("doc_id", "bkt").agg(
        F.count("*").alias("cnt"), F.max("is_probe").alias("hit")
    )
    wcol = (
        hash64(F.concat(F.lit("w:"), F.col("bkt").cast("string"))) % 2001
        - 1000
    ) / 1000.0
    scored = g.groupBy("doc_id").agg(
        prnd(
            1.0
            / (1.0 + F.exp(-(F.sum(F.col("cnt") * wcol) / F.sum("cnt")))),
            6,
        ).alias("prob"),
        F.max("hit").cast("int").alias("y"),
    )
    th = docs.sparkSession.createDataFrame(
        [(t,) for t in _Q334_THRESHOLDS], "t double"
    )
    j = scored.crossJoin(F.broadcast(th))
    cells = j.groupBy("t").agg(
        F.sum(
            F.when((F.col("prob") >= F.col("t")) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("prob") >= F.col("t")) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("prob") < F.col("t")) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("fn"),
    )
    return cells.select(
        prnd(F.col("t"), 6).alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        prnd(
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
            ),
            6,
        ).alias("precision_"),
        prnd(
            F.when(
                F.col("tp") + F.col("fn") > 0,
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
            ),
            6,
        ).alias("recall_"),
        prnd(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# q340 Mann-Whitney U test on document lengths between language pairs
# ---------------------------------------------------------------------------


def _q340_oracle() -> str:
    return f"""
    WITH langs AS (SELECT DISTINCT lang FROM documents),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM langs a JOIN langs b ON a.lang < b.lang
    ),
    member AS (
      SELECT p.lang_a, p.lang_b, 'a' AS side, d.n_chars
      FROM pairs p JOIN documents d ON d.lang = p.lang_a
      UNION ALL
      SELECT p.lang_a, p.lang_b, 'b' AS side, d.n_chars
      FROM pairs p JOIN documents d ON d.lang = p.lang_b
    ),
    ranked AS (
      SELECT lang_a, lang_b, side, n_chars,
             rank() OVER (PARTITION BY lang_a, lang_b
                          ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY lang_a, lang_b, n_chars) AS teq
      FROM member
    ),
    stats AS (
      SELECT lang_a, lang_b,
             sum(CASE WHEN side = 'a'
                      THEN rk + (teq - 1) / 2.0 ELSE 0.0 END) AS r_a,
             sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS n_b
      FROM ranked GROUP BY lang_a, lang_b
    ),
    tg AS (
      SELECT lang_a, lang_b, sum(t * t * t - t) AS tie_sum
      FROM (
        SELECT lang_a, lang_b, n_chars, count(*) AS t
        FROM member GROUP BY lang_a, lang_b, n_chars
      ) GROUP BY lang_a, lang_b
    )
    SELECT s.lang_a, s.lang_b,
           CAST(s.n_a AS BIGINT) AS n_a,
           CAST(s.n_b AS BIGINT) AS n_b,
           {o_rnd('s.r_a - s.n_a * (s.n_a + 1) / 2.0', 6)} AS u_stat,
           {o_rnd('''(s.r_a - s.n_a * (s.n_a + 1) / 2.0
                      - s.n_a * s.n_b / 2.0)
                  / sqrt(s.n_a * s.n_b / 12.0
                         * ((s.n_a + s.n_b + 1.0)
                            - t.tie_sum * 1.0
                              / ((s.n_a + s.n_b)
                                 * (s.n_a + s.n_b - 1.0))))''', 6)} AS z_score
    FROM stats s
    JOIN tg t ON s.lang_a = t.lang_a AND s.lang_b = t.lang_b
    """


@query("q340_mann_whitney", oracle=_q340_oracle())
def q340_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between every language pair's
    document-length distributions — the nonparametric two-sample
    location test a curation pipeline reaches for before trusting a
    per-language length-filter threshold (q193's KS test checks shape,
    this checks median shift; q326's ANOVA assumes normality, this
    does not). Uses average ranks for ties (rank() + (teq-1)/2, exact
    .5-increment doubles from integer n_chars) and the tie-corrected
    normal approximation sigma^2 = n_a n_b/12 ((N+1) - sum(t^3-t)/
    (N(N-1))). Shape: a 10-row broadcast pair list fans documents out
    per pair (bounded langs^2 blowup), then one rank window per pair
    and hash aggs — all-integer rank arithmetic, engine-exact."""
    d = table(spark, sf_dir, "documents").select("lang", "n_chars")
    langs = d.select("lang").distinct()
    pairs = (
        langs.select(F.col("lang").alias("lang_a"))
        .crossJoin(langs.select(F.col("lang").alias("lang_b")))
        .filter(F.col("lang_a") < F.col("lang_b"))
    )
    side_a = F.broadcast(pairs).join(
        d, pairs.lang_a == d.lang
    ).select("lang_a", "lang_b", F.lit("a").alias("side"), "n_chars")
    side_b = F.broadcast(pairs).join(
        d, pairs.lang_b == d.lang
    ).select("lang_a", "lang_b", F.lit("b").alias("side"), "n_chars")
    member = side_a.unionAll(side_b)
    ranked = member.select(
        "lang_a",
        "lang_b",
        "side",
        "n_chars",
        F.rank()
        .over(W.partitionBy("lang_a", "lang_b").orderBy("n_chars"))
        .alias("rk"),
        F.count("*")
        .over(W.partitionBy("lang_a", "lang_b", "n_chars"))
        .alias("teq"),
    )
    stats = ranked.groupBy("lang_a", "lang_b").agg(
        F.sum(
            F.when(
                F.col("side") == "a",
                F.col("rk") + (F.col("teq") - 1) / 2.0,
            ).otherwise(0.0)
        ).alias("r_a"),
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("n_b"),
    )
    tg = (
        member.groupBy("lang_a", "lang_b", "n_chars")
        .agg(F.count("*").alias("t"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_sum")
        )
    )
    j = stats.join(tg, ["lang_a", "lang_b"])
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u = F.col("r_a") - n_a * (n_a + 1) / 2.0
    nn = n_a + n_b
    sigma = F.sqrt(
        n_a * n_b / 12.0
        * ((nn + 1.0) - F.col("tie_sum") * 1.0 / (nn * (nn - 1.0)))
    )
    return j.select(
        "lang_a",
        "lang_b",
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        prnd(u, 6).alias("u_stat"),
        prnd((u - n_a * n_b / 2.0) / sigma, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q344 DSIR-style importance-resampling weights (target = English docs)
# ---------------------------------------------------------------------------


def _q344_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok,
             count(*) AS c_src,
             count(*) FILTER (WHERE lang = 'en') AS c_tgt
      FROM tok GROUP BY tok
    ),
    totals AS (
      SELECT sum(c_src) AS n_src, sum(c_tgt) AS n_tgt,
             count(*) AS v
      FROM vocab
    ),
    weighted AS (
      SELECT t.doc_id,
             count(*) AS n_toks,
             sum(ln(((vb.c_tgt + 1.0) / (tt.n_tgt + tt.v))
                    / ((vb.c_src + 1.0) / (tt.n_src + tt.v)))) AS llr
      FROM tok t
      JOIN vocab vb ON vb.tok = t.tok
      CROSS JOIN totals tt
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_toks AS BIGINT) AS n_toks,
           {o_rnd('llr', 6)} AS dsir_log_weight,
           {o_rnd('llr / n_toks', 6)} AS per_token_log_weight
    FROM weighted
    WHERE doc_id % 7 = 0
    """


@query("q344_dsir_weights", oracle=_q344_oracle())
def q344_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): each
    document scores sum_t log(p_target(t)/p_source(t)) under add-1-
    smoothed unigram models, here with target = the English slice and
    source = the whole corpus — the importance weights that skew a
    pretraining sample toward a target domain; pairs with q328's
    soft-dedup weights (that one downweights duplicates, this one
    upweights domain match). Shape: one token explode, a hash-grouped
    vocab with both counts in ONE pass (conditional count, no second
    scan), a broadcastable 1-row totals frame, then a vocab equi-join
    back to the token stream — at 100 TB the vocab table is the only
    shuffled state and it's Zipf-bounded; per-doc log sums are
    order-drift-safe far below the 1e-6 grid."""
    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(
        F.count("*").alias("c_src"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("c_tgt"),
    )
    totals = vocab.agg(
        F.sum("c_src").alias("n_src"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    p_tgt = (F.col("c_tgt") + 1.0) / (F.col("n_tgt") + F.col("v"))
    p_src = (F.col("c_src") + 1.0) / (F.col("n_src") + F.col("v"))
    weighted = (
        tok.join(vocab, "tok")  # AQE broadcasts while vocab is small;
        # at 100 TB this stays a shuffle join on the Zipf-bounded vocab
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.log(p_tgt / p_src)).alias("llr"),
        )
    )
    return weighted.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        prnd("llr", 6).alias("dsir_log_weight"),
        prnd(F.col("llr") / F.col("n_toks"), 6).alias("per_token_log_weight"),
    )


# ---------------------------------------------------------------------------
# q345 Heaps'-law vocabulary growth per source
# ---------------------------------------------------------------------------

_HEAPS_STEP = 200


def _q345_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, source, t.tok, t.pos
      FROM documents,
           (SELECT unnest({_TOKS_SQL}) AS tok,
                   unnest(range(1, len({_TOKS_SQL}) + 1)) AS pos) t
    ),
    flagged AS (
      SELECT source, doc_id, pos, tok,
             CASE WHEN row_number() OVER (
                    PARTITION BY source, tok ORDER BY doc_id, pos) = 1
                  THEN 1 ELSE 0 END AS first_occ
      FROM tok
    ),
    stream AS (
      SELECT source,
             row_number() OVER (PARTITION BY source
                                ORDER BY doc_id, pos, tok) AS n,
             sum(first_occ) OVER (PARTITION BY source
                                  ORDER BY doc_id, pos, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM flagged
    ),
    pts AS (
      SELECT source, ln(CAST(n AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
      FROM stream WHERE n % {_HEAPS_STEP} = 0
    ),
    fit AS (
      SELECT source, count(*) AS m,
             avg(x) AS mx, avg(y) AS my,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY source
    )
    SELECT source,
           CAST(m AS BIGINT) AS n_points,
           {o_rnd('(sxy - m * mx * my) / (sxx - m * mx * mx)', 6)}
             AS heaps_beta,
           {o_rnd('''exp(my - (sxy - m * mx * my) / (sxx - m * mx * mx)
                          * mx)''', 6)} AS heaps_k
    FROM fit
    """


@query("q345_heaps_law", oracle=_q345_oracle())
def q345_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = k N^beta of vocabulary growth per source
    — the companion to q264's Zipf fit (the two laws are duals): a
    curation pipeline uses beta to project tokenizer-vocab coverage
    and dedup yield to corpus sizes far beyond the sample, and a
    source whose beta is anomalously high is machine-generated noise
    (unbounded novel tokens). First occurrences are flagged with a
    rank-1 test per (source, token) in reading order (doc_id, pos),
    the running vocab size is a prefix sum, checkpoints every 200
    tokens become (ln N, ln V) points, and OLS in log space runs on
    sufficient statistics. Shape: one window per (source, token) and
    one per source — token streams never join each other; the OLS is
    a 5-number hash agg per source."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"),
    ).select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "tok")
    flagged = tok.select(
        "source",
        "doc_id",
        "pos",
        "tok",
        F.when(
            F.row_number().over(
                W.partitionBy("source", "tok").orderBy("doc_id", "pos")
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("first_occ"),
    )
    ws = W.partitionBy("source").orderBy("doc_id", "pos", "tok")
    stream = flagged.select(
        "source",
        F.row_number().over(ws).alias("n"),
        F.sum("first_occ")
        .over(ws.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("v"),
    )
    pts = stream.filter(F.col("n") % _HEAPS_STEP == 0).select(
        "source",
        F.log(F.col("n").cast("double")).alias("x"),
        F.log(F.col("v").cast("double")).alias("y"),
    )
    fit = pts.groupBy("source").agg(
        F.count("*").alias("m"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (F.col("sxy") - F.col("m") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("m") * F.col("mx") * F.col("mx")
    )
    return fit.select(
        "source",
        F.col("m").cast("long").alias("n_points"),
        prnd(beta, 6).alias("heaps_beta"),
        prnd(F.exp(F.col("my") - beta * F.col("mx")), 6).alias("heaps_k"),
    )


# ---------------------------------------------------------------------------
# q349 paragraph-level dedup (C4-style keep-first) with corpus accounting
# ---------------------------------------------------------------------------

_PARA_W = 10  # tokens per pseudo-paragraph


def _q349_oracle() -> str:
    w = _PARA_W
    return f"""
    WITH tok AS (
      SELECT doc_id, source, t.tok, t.pos
      FROM documents,
           (SELECT unnest({_TOKS_SQL}) AS tok,
                   unnest(range(1, len({_TOKS_SQL}) + 1)) AS pos) t
    ),
    chunks AS (
      SELECT doc_id, source, (pos - 1) // {w} AS chunk_idx,
             count(*) AS n_toks,
             string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM tok GROUP BY doc_id, source, (pos - 1) // {w}
    ),
    flagged AS (
      SELECT source, doc_id, chunk_idx, n_toks,
             CASE WHEN row_number() OVER (
                    PARTITION BY chunk_text
                    ORDER BY doc_id, chunk_idx) = 1
                  THEN 1 ELSE 0 END AS keep
      FROM chunks
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(1 - keep) AS BIGINT) AS dup_chunks,
           {o_rnd('sum((1 - keep) * n_toks) * 1.0 / sum(n_toks)', 6)}
             AS dup_token_share
    FROM flagged
    GROUP BY source
    """


@query("q349_paragraph_dedup", oracle=_q349_oracle())
def q349_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with keep-first semantics — the
    C4/RefinedWeb intra-corpus transform that q43 (whole-document
    fingerprints) cannot express: boilerplate repeats INSIDE otherwise
    unique documents, so dedup must operate on sub-document units and
    then account for what survives. Documents are chunked into
    10-token pseudo-paragraphs (order-exact string_agg / sorted-struct
    reconstruction), the first occurrence in (doc_id, chunk_idx)
    order is kept, and the per-source report gives the duplicated-
    token share a curation run would reclaim. Shape: the dedup is one
    hash groupBy-window on the chunk text (at 100 TB: on its 64-bit
    hash, same plan as q43, map-side partial) — no pairwise joins
    anywhere; chunk reconstruction is a sorted-struct transform, all
    JVM-side."""
    w = _PARA_W
    tok = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"),
    )
    chunks = (
        tok.groupBy(
            "doc_id",
            "source",
            F.floor(F.col("pos0") / w).alias("chunk_idx"),
        )
        .agg(
            F.count("*").alias("n_toks"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos0", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    flagged = chunks.select(
        "source",
        "doc_id",
        "chunk_idx",
        "n_toks",
        F.when(
            F.row_number().over(
                W.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return flagged.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(1 - F.col("keep")).cast("long").alias("dup_chunks"),
        prnd(
            F.sum((1 - F.col("keep")) * F.col("n_toks"))
            * 1.0
            / F.sum("n_toks"),
            6,
        ).alias("dup_token_share"),
    )


# ---------------------------------------------------------------------------
# q356 tokenizer fertility audit (dataset-card tokenization economics)
# ---------------------------------------------------------------------------

_Q356_PIECE = 4  # fixed-width subword chunk (chars) for the fertility proxy
_Q356_LONG = 7  # tokens at or above this length are "long"


@query(
    "q356_tokenizer_fertility",
    oracle=f"""
    WITH d AS (
      SELECT lang, n_chars, {_TOKS_SQL} AS toks FROM documents
    ),
    docs AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars_total,
             CAST(sum(len(toks)) AS BIGINT) AS tokens_total
      FROM d GROUP BY lang
    ),
    tok AS (
      SELECT lang, unnest(toks) AS tok FROM d
    ),
    tstats AS (
      SELECT lang,
             CAST(sum(CAST(ceil(length(tok) / {_Q356_PIECE}.0) AS BIGINT)) AS BIGINT) AS pieces_total,
             CAST(count(*) FILTER (WHERE length(tok) >= {_Q356_LONG}) AS BIGINT) AS long_tokens
      FROM tok GROUP BY lang
    )
    SELECT d.lang, d.n_docs, d.tokens_total,
           {o_rnd('CAST(d.chars_total AS DOUBLE) / d.tokens_total', 6)} AS chars_per_token,
           {o_rnd('CAST(t.pieces_total AS DOUBLE) / d.tokens_total', 6)} AS subword_fertility,
           {o_rnd('CAST(t.long_tokens AS DOUBLE) / d.tokens_total', 6)} AS long_token_frac,
           {o_rnd('CAST(d.tokens_total AS DOUBLE) / d.n_docs', 6)} AS tokens_per_doc
    FROM docs d JOIN tstats t USING (lang)
    """,
)
def q356_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language — the dataset-card
    economics of tokenization: chars per whitespace token, subword
    fertility under a fixed-width 4-char chunker (pieces per token —
    the metric real BPE tokenizers report per language to expose
    under-served scripts), long-token fraction, and tokens per doc.
    Fertility differences ARE the compute-cost differences between
    languages in a multilingual training run.

    Two partial-agg passes (doc-level and token-level, both keyed by
    lang) joined on the tiny lang dimension; the token explosion is
    map-side and every statistic is integer until the final ratios.
    At 100 TB: the same two groupBys, no shuffle wider than
    |languages| rows."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select("lang", "n_chars", tokens("text").alias("toks"))
    doc_agg = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
        F.sum(F.size("toks")).cast("long").alias("tokens_total"),
    )
    tok = d.select("lang", F.explode("toks").alias("tok"))
    tstats = tok.groupBy("lang").agg(
        F.sum(F.ceil(F.length("tok") / float(_Q356_PIECE)).cast("long"))
        .cast("long")
        .alias("pieces_total"),
        F.count(F.when(F.length("tok") >= _Q356_LONG, 1))
        .cast("long")
        .alias("long_tokens"),
    )
    j = doc_agg.join(tstats, "lang")
    return j.select(
        "lang",
        "n_docs",
        "tokens_total",
        prnd(
            F.col("chars_total").cast("double") / F.col("tokens_total"), 6
        ).alias("chars_per_token"),
        prnd(
            F.col("pieces_total").cast("double") / F.col("tokens_total"), 6
        ).alias("subword_fertility"),
        prnd(
            F.col("long_tokens").cast("double") / F.col("tokens_total"), 6
        ).alias("long_token_frac"),
        prnd(
            F.col("tokens_total").cast("double") / F.col("n_docs"), 6
        ).alias("tokens_per_doc"),
    )


# ---------------------------------------------------------------------------
# q357 cross-split n-gram novelty (memorization exposure audit)
# ---------------------------------------------------------------------------

_Q357_N = 4  # shingle width
_Q357_TRAIN_BUCKETS = 8  # hash buckets 0-7 of 10 -> train, 8-9 -> test


@query(
    "q357_ngram_novelty",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS toks,
             ({o_hash64('CAST(doc_id AS VARCHAR)')}) % 10 < {_Q357_TRAIN_BUCKETS} AS is_train
      FROM documents
    ),
    sh AS (
      SELECT doc_id, lang, is_train, unnest(
        CASE WHEN len(toks) >= {_Q357_N}
             THEN list_distinct(list_transform(
                    range(1, len(toks) - {_Q357_N - 2}),
                    i -> array_to_string(list_slice(toks, i, i + {_Q357_N - 1}), ' ')))
             ELSE CAST([] AS VARCHAR[]) END) AS s
      FROM d
    ),
    train_set AS (SELECT DISTINCT s FROM sh WHERE is_train),
    test AS (
      SELECT sh.lang, sh.s, (t.s IS NOT NULL) AS seen
      FROM sh LEFT JOIN train_set t USING (s)
      WHERE NOT sh.is_train
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS test_ngrams,
           CAST(count(*) FILTER (WHERE NOT seen) AS BIGINT) AS novel_ngrams,
           {o_rnd('CAST(count(*) FILTER (WHERE NOT seen) AS DOUBLE) / count(*)', 6)} AS novelty_rate
    FROM test GROUP BY lang
    """,
)
def q357_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split n-gram novelty: hash-split the corpus 80/20, build
    the train split's distinct 4-gram set, and measure what fraction
    of each language's test-split 4-grams never appear in train — the
    memorization-exposure audit (low novelty = the held-out split can
    be 'predicted' by copying; also the denominator style used for
    generation-novelty metrics a la RAVEN/Copying studies).

    Scale shape: shingle explosion is map-side (per-doc distinct
    arrays bound duplicates), the train set is a hash groupBy
    DISTINCT, and membership is ONE left join on the shingle string —
    at 100 TB this is the contamination-screen join (q87) pointed at
    the pipeline's own split instead of an external benchmark.  The
    deterministic doc_id hash split reproduces q73's split law, so
    the same rows land train/test in any engine."""
    from ..functions.portable import hash64
    from ..operators.text import word_shingles

    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        (hash64("doc_id") % 10 < _Q357_TRAIN_BUCKETS).alias("is_train"),
        F.array_distinct(word_shingles(tokens("text"), _Q357_N)).alias(
            "shs"
        ),
    )
    sh = d.select(
        "lang", "is_train", F.explode("shs").alias("s")
    )
    train_set = (
        sh.filter(F.col("is_train")).select("s").distinct()
        .withColumn("seen", F.lit(1))
    )
    test = sh.filter(~F.col("is_train")).join(train_set, "s", "left")
    return test.groupBy("lang").agg(
        F.count("*").cast("long").alias("test_ngrams"),
        F.count(F.when(F.col("seen").isNull(), 1))
        .cast("long")
        .alias("novel_ngrams"),
        prnd(
            F.count(F.when(F.col("seen").isNull(), 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# q362 weighted-lexicon content screen (blocklist / toxicity stage)
# ---------------------------------------------------------------------------

# (term, severity) — the deterministic stand-in for a toxicity/blocklist
# lexicon; weights make the screen graded, not binary
_Q362_LEXICON = (("slow", 1), ("big", 1), ("dup", 3))
_Q362_FLAG_AT = 4  # weighted hits at/above this flag the document


def _q362_oracle() -> str:
    vals = ", ".join(f"('{t}', {w})" for t, w in _Q362_LEXICON)
    return f"""
    WITH lex(term, sev) AS (VALUES {vals}),
    tok AS (
      SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    hits AS (
      SELECT t.doc_id, t.source,
             count(l.term) AS n_hits,
             coalesce(sum(l.sev), 0) AS sev_sum
      FROM tok t LEFT JOIN lex l ON l.term = t.tok
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_total,
           CAST(count(*) FILTER (WHERE sev_sum >= {_Q362_FLAG_AT}) AS BIGINT) AS docs_flagged,
           {o_rnd(f'CAST(count(*) FILTER (WHERE sev_sum >= {_Q362_FLAG_AT}) AS DOUBLE) / count(*)', 6)} AS flag_rate,
           {o_rnd('avg(CAST(sev_sum AS DOUBLE))', 6)} AS avg_severity,
           CAST(max(sev_sum) AS BIGINT) AS max_severity
    FROM hits GROUP BY source
    """


@query("q362_content_screen", oracle=_q362_oracle())
def q362_content_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-lexicon content screen — the blocklist/toxicity stage
    of a curation pipeline: every token joins a tiny severity-weighted
    lexicon, per-document weighted hit mass flags documents at a
    threshold, and per-SOURCE exposure rates (flag rate, mean/max
    severity) feed the dataset card and the decision of which sources
    need human review.  The lexicon here is a deterministic stand-in;
    swapping in a real blocklist changes one literal table and nothing
    else.

    Scale shape: the lexicon is a broadcast literal; the token
    explosion is map-side and the hit counting is one partial-agg
    groupBy per doc then per source — the same two-rollup shape as
    q356.  No shuffle carries token rows beyond the doc rollup."""
    lex = spark.createDataFrame(
        list(_Q362_LEXICON), "term string, sev int"
    )
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(tokens("text")).alias("tok")
    )
    hits = (
        tok.join(F.broadcast(lex), tok.tok == lex.term, "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("term").alias("n_hits"),
            F.coalesce(F.sum("sev"), F.lit(0)).cast("long").alias("sev_sum"),
        )
    )
    flagged = F.col("sev_sum") >= _Q362_FLAG_AT
    return hits.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_total"),
        F.count(F.when(flagged, 1)).cast("long").alias("docs_flagged"),
        prnd(
            F.count(F.when(flagged, 1)).cast("double") / F.count("*"), 6
        ).alias("flag_rate"),
        prnd(F.avg(F.col("sev_sum").cast("double")), 6).alias("avg_severity"),
        F.max("sev_sum").cast("long").alias("max_severity"),
    )


# ---------------------------------------------------------------------------
# q366 Flesch readability per source
# ---------------------------------------------------------------------------

_Q366_HARD_AT = 30.0  # Flesch reading-ease below this = "very difficult"


def _q366_oracle() -> str:
    w = "greatest(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')))"
    syl = "greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))"
    s = "greatest(1, len(regexp_extract_all(text, '[.!?]+')))"
    ease = (
        f"206.835 - 1.015 * (CAST({w} AS DOUBLE) / {s})"
        f" - 84.6 * (CAST({syl} AS DOUBLE) / {w})"
    )
    grade = (
        f"0.39 * (CAST({w} AS DOUBLE) / {s})"
        f" + 11.8 * (CAST({syl} AS DOUBLE) / {w}) - 15.59"
    )
    return f"""
    WITH d AS (
      SELECT source, {ease} AS ease, {grade} AS grade FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs,
           {o_rnd('avg(ease)', 4)} AS avg_ease,
           {o_rnd('avg(grade)', 4)} AS avg_grade,
           {o_rnd(f'CAST(count(*) FILTER (WHERE ease < {_Q366_HARD_AT}) AS DOUBLE) / count(*)', 6)} AS hard_rate
    FROM d GROUP BY source
    """


@query("q366_readability", oracle=_q366_oracle())
def q366_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease / Flesch-Kincaid grade per source — the
    classic readability screen a curation pipeline runs next to
    quality scoring (q42): word count from alphanumeric runs,
    syllables from vowel-group runs (the standard dictionary-free
    estimate; vowel runs never cross a space so one whole-text regex
    equals the per-word sum), sentences from terminal-punctuation
    runs, all clamped to >= 1 so degenerate docs stay finite.

    Pure codegen'd regexp counting in the scan — no explode, no
    shuffle beyond the final per-source partial agg; at 100 TB this
    is a map-only pass like q40."""
    low = F.lower(F.col("text"))
    w = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(low, F.lit("[a-z0-9]+"), F.lit(0)))
    ).cast("double")
    syl = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0)))
    ).cast("double")
    s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
    ).cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (syl / w)
    grade = F.lit(0.39) * (w / s) + F.lit(11.8) * (syl / w) - F.lit(15.59)
    d = spread_small_scan(table(spark, sf_dir, "documents")).select(
        "source", ease.alias("ease"), grade.alias("grade")
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("docs"),
        prnd(F.avg("ease"), 4).alias("avg_ease"),
        prnd(F.avg("grade"), 4).alias("avg_grade"),
        prnd(
            F.count(F.when(F.col("ease") < _Q366_HARD_AT, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("hard_rate"),
    )


# ---------------------------------------------------------------------------
# q367 duplicated-span coverage (exact substring dedup audit)
# ---------------------------------------------------------------------------

_Q367_K = 8  # span length in tokens (Lee et al. use 50 BPE tokens; scaled)


def _q367_oracle() -> str:
    k = _Q367_K
    sh_str = f"array_to_string(list_slice(toks, i, i + {k - 1}), ' ')"
    return f"""
    WITH d AS (
      SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
    ),
    pos AS (
      SELECT doc_id, source, unnest(range(1, len(toks) - {k - 2})) AS i, toks
      FROM d WHERE len(toks) >= {k}
    ),
    sh AS (
      SELECT doc_id, source, {o_hash64(sh_str)} AS h FROM pos
    ),
    nd AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM sh GROUP BY h),
    per_doc AS (
      SELECT sh.doc_id, any_value(sh.source) AS source,
             count(*) AS n_pos,
             count(*) FILTER (WHERE nd.ndocs >= 2) AS dup_pos
      FROM sh JOIN nd USING (h) GROUP BY sh.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_measured,
           {o_rnd('avg(CAST(dup_pos AS DOUBLE) / n_pos)', 6)} AS avg_dup_rate,
           {o_rnd('max(CAST(dup_pos AS DOUBLE) / n_pos)', 6)} AS max_dup_rate,
           CAST(count(*) FILTER (WHERE dup_pos * 2 >= n_pos) AS BIGINT) AS docs_flagged
    FROM per_doc GROUP BY source
    """


@query("q367_span_dedup", oracle=_q367_oracle())
def q367_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage audit (the ExactSubstr dedup signal of
    Lee et al. 2022 'Deduplicating Training Data Makes Language
    Models Better', scaled to 8-token spans): every token position
    opens a k-token span; a position is DUPLICATED if its span occurs
    in at least one other document.  Per-source mean/max coverage and
    a >= 50%-covered flag count tell you which sources are boilerplate
    farms — finer-grained than doc-level (q43) or paragraph-level
    (q349) dedup, which both miss long shared runs embedded in
    otherwise-unique pages.

    Scale shape: span keys are 64-bit hashes, duplication is one
    hash groupBy — never pairwise doc comparison; the same
    shingle-as-inverted-index law as q89.  r13 restructure (guide
    S2.3/S2.5 — aggregate before you shuffle, kill the hot key): a
    span is duplicated iff its hash occurs in >= 2 DISTINCT docs,
    i.e. iff min(doc_id) != max(doc_id) over the hash — and min/max/
    count are classic partial aggregates, so the span-position stream
    now collapses to at most ONE row per distinct hash per map task
    BEFORE the only h-keyed exchange (the r12 shape repartitioned the
    raw position stream, so a corpus-wide boilerplate span
    concentrated its full row set — bounded only by the document
    count — into one task's sort; VERDICT r12 item 8).  The per-doc
    attach then needs NO join back on h at all: complement algebra —
    dup_pos(doc) = n_pos(doc) - unique_pos(doc), where a UNIQUE hash
    (mn == mx) identifies its owning doc as mn and contributes its
    full position count, so unique_pos is one doc-grain aggregation
    of the h-grain frame; and n_pos(doc) = n_tokens - k + 1 comes
    straight off the documents scan (the identical split-on-space
    token count the kernel uses), which the query already reads for
    the source label.  The r12 shape's (h, doc)-grain aggregation,
    its count window (single-task sort on the hot h), and the
    position-grain repartition all disappear; every surviving
    exchange carries h-grain or doc-grain metadata rows."""
    from ..operators.text import span_hash_rows, tokens

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    # span hashing is the mapInPandas kernel (guide S4.2): the
    # expression form (ladder shingles -> explode -> md5) measured
    # 2.55 s at sf0.1 against the kernel's 0.39 s, bit-identical
    # output (see span_hash_rows / tests/test_span_kernel.py); a doc
    # shorter than k emits no rows in both forms, so no pre-filter is
    # needed (and a filter on a computed column would inline its whole
    # expression into the Filter — guide S4.4's duplication trap)
    sh = span_hash_rows(docs, _Q367_K)
    nd = sh.groupBy("h").agg(
        F.min("doc_id").alias("_mn"),
        F.max("doc_id").alias("_mx"),
        F.count("*").alias("_cnt"),
    )
    uniq = (
        nd.filter(F.col("_mn") == F.col("_mx"))
        .groupBy(F.col("_mn").alias("doc_id"))
        .agg(F.sum("_cnt").alias("_uniq_pos"))
    )
    # n_pos = token count - k + 1, exactly the kernel's span count per
    # doc (same split-on-space semantics); docs shorter than k emit no
    # spans and are excluded, matching the r12 shape's implicit drop
    base = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            (F.size(tokens("text")) - F.lit(_Q367_K - 1)).alias("n_pos"),
        )
        .filter(F.col("n_pos") > 0)
    )
    per_doc = base.join(uniq, "doc_id", "left").select(
        "doc_id",
        "source",
        F.col("n_pos").cast("long").alias("n_pos"),
        # a doc whose every span is shared reads uniq_pos = NULL -> 0
        (F.col("n_pos") - F.coalesce(F.col("_uniq_pos"), F.lit(0)))
        .cast("long")
        .alias("dup_pos"),
    )
    rate = F.col("dup_pos").cast("double") / F.col("n_pos")
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_measured"),
        prnd(F.avg(rate), 6).alias("avg_dup_rate"),
        prnd(F.max(rate), 6).alias("max_dup_rate"),
        F.count(F.when(F.col("dup_pos") * 2 >= F.col("n_pos"), 1))
        .cast("long")
        .alias("docs_flagged"),
    )


# ---------------------------------------------------------------------------
# q369 RAKE keyphrase extraction per source
# ---------------------------------------------------------------------------

# delimiter lexicon: all language-ID markers + common EN function words;
# any token outside ^[a-z0-9]+$ (punctuation-bearing) also splits phrases
_Q369_STOP = tuple(
    sorted(
        {t for ms in LANG_MARKERS.values() for t in ms}
        | {
            "an", "in", "on", "for", "with", "that", "it", "as", "at",
            "by", "be", "are", "was", "or", "this", "from",
        }
    )
)
_Q369_MIN_LEN, _Q369_MAX_LEN, _Q369_TOP = 2, 4, 3


def _q369_oracle() -> str:
    stop = _in_list(_Q369_STOP)
    return f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    t0 AS (
      SELECT doc_id, source, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS i
      FROM d
    ),
    cand AS (
      SELECT doc_id, source, i, tok FROM t0
      WHERE tok NOT IN {stop} AND regexp_matches(tok, '^[a-z0-9]+$')
    ),
    runs AS (
      SELECT doc_id, source, i, tok,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS run
      FROM cand
    ),
    ph AS (
      SELECT doc_id, run, count(*) AS plen FROM runs GROUP BY doc_id, run
    ),
    tokp AS (
      SELECT r.doc_id, r.source, r.run, r.i, r.tok, p.plen
      FROM runs r JOIN ph p ON p.doc_id = r.doc_id AND p.run = r.run
    ),
    ws AS (
      SELECT doc_id, tok, count(*) AS freq, sum(plen) AS deg
      FROM tokp GROUP BY doc_id, tok
    ),
    scored AS (
      SELECT t.doc_id, t.source, t.run,
             string_agg(t.tok, ' ' ORDER BY t.i) AS phrase,
             count(*) AS plen,
             sum(CAST(w.deg AS DOUBLE) / w.freq) AS score
      FROM tokp t JOIN ws w ON w.doc_id = t.doc_id AND w.tok = t.tok
      GROUP BY t.doc_id, t.source, t.run
    ),
    best AS (
      SELECT source, phrase, max(plen) AS plen, max(score) AS score
      FROM scored
      WHERE plen BETWEEN {_Q369_MIN_LEN} AND {_Q369_MAX_LEN}
      GROUP BY source, phrase
    ),
    ranked AS (
      SELECT source, phrase, plen, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY {o_rnd('score', 4)} DESC, phrase) AS rk
      FROM best
    )
    SELECT source, phrase,
           CAST(plen AS INTEGER) AS phrase_len,
           {o_rnd('score', 4)} AS rake_score,
           CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_Q369_TOP}
    """


@query("q369_rake_keyphrases", oracle=_q369_oracle())
def q369_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal token runs between stopwords/punctuation; word score
    deg/freq (deg = summed length of phrases containing the word,
    freq = occurrences) and phrase score = sum of word scores, all
    PER DOCUMENT as RAKE defines; top-3 phrases per source by best
    score.  The cheap extractive-keyword stage of a curation
    pipeline (feeds topic inventories on dataset cards, q363).

    Scale shape: everything is keyed by doc_id — the run-id window,
    the phrase-length rollup, the word-stat groupBy and both joins —
    so the whole extraction is embarrassingly doc-parallel with
    uniform keys; only the final per-source top-3 (tiny after the
    phrase dedup rollup) crosses documents.  Ordered phrase
    reassembly is sort_array(collect_list(struct(i, tok))) — no
    window re-sort."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    t0 = docs.select(
        "doc_id", "source",
        F.posexplode(tokens("text")).alias("i", "tok"),
    )
    cand = t0.filter(
        ~F.col("tok").isin(*_Q369_STOP)
        & F.col("tok").rlike("^[a-z0-9]+$")
    )
    runs = cand.select(
        "doc_id", "source", "i", "tok",
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy("doc_id").orderBy("i")
            )
        ).alias("run"),
    )
    ph = runs.groupBy("doc_id", "run").agg(F.count("*").alias("plen"))
    tokp = runs.join(ph, ["doc_id", "run"])
    ws = tokp.groupBy("doc_id", "tok").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    scored = (
        tokp.join(ws, ["doc_id", "tok"])
        .groupBy("doc_id", "source", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "tok"))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
            F.sum(F.col("deg").cast("double") / F.col("freq")).alias("score"),
        )
    )
    best = (
        scored.filter(
            F.col("plen").between(_Q369_MIN_LEN, _Q369_MAX_LEN)
        )
        .groupBy("source", "phrase")
        .agg(F.max("plen").alias("plen"), F.max("score").alias("score"))
    )
    ranked = best.select(
        "source", "phrase", "plen", "score",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                prnd("score", 4).desc(), "phrase"
            )
        )
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= _Q369_TOP).select(
        "source", "phrase",
        F.col("plen").cast("int").alias("phrase_len"),
        prnd("score", 4).alias("rake_score"),
        F.col("rk").cast("int").alias("rk"),
    )


# ---------------------------------------------------------------------------
# q373 Kneser-Ney bigram language model (per-language NLL / perplexity)
# ---------------------------------------------------------------------------

_Q373_D = 0.75  # absolute discount


def _q373_oracle() -> str:
    d = _Q373_D
    return f"""
    WITH docs2 AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
    bg AS (
      SELECT lang,
             unnest(CASE WHEN len(toks) >= 2 THEN
                list_transform(range(1, len(toks)),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS s
      FROM docs2
    ),
    sp AS (
      SELECT lang, s, string_split(s, ' ')[1] AS v, string_split(s, ' ')[2] AS w
      FROM bg
    ),
    big AS (
      SELECT lang, s, any_value(v) AS v, any_value(w) AS w, count(*) AS n
      FROM sp GROUP BY lang, s
    ),
    hist AS (
      SELECT lang, v, CAST(sum(n) AS DOUBLE) AS c_v, count(*) AS n1p_fwd
      FROM big GROUP BY lang, v
    ),
    cont AS (SELECT lang, w, count(*) AS n1p_back FROM big GROUP BY lang, w),
    tot AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_types FROM big GROUP BY lang),
    p AS (
      SELECT b.lang, b.n,
             (greatest(b.n - {d}, 0.0) / h.c_v)
             + ({d} * h.n1p_fwd / h.c_v) * (c.n1p_back / t.n_types) AS pkn
      FROM big b
      JOIN hist h ON h.lang = b.lang AND h.v = b.v
      JOIN cont c ON c.lang = b.lang AND c.w = b.w
      JOIN tot t ON t.lang = b.lang
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_types,
           {o_rnd('-sum(n * ln(pkn)) / sum(n)', 6)} AS nll,
           {o_rnd('exp(-sum(n * ln(pkn)) / sum(n))', 4)} AS perplexity
    FROM p GROUP BY lang
    """


@query("q373_kneser_ney", oracle=_q373_oracle())
def q373_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM per language (absolute
    discount D = 0.75): P(w|v) = max(c(vw)-D,0)/c(v) +
    D*N1+(v.)/c(v) * N1+(.w)/|bigram types| — THE canonical n-gram
    smoothing; corpus self-NLL and perplexity per language.  One rung
    above q158's raw bigram NLL: the continuation counts N1+ are what
    distinguish KN (novel-continuation mass goes to words seen in
    many CONTEXTS, not many times).  Train = eval corpus, the
    standard in-corpus fluency diagnostic for curation (a source
    whose perplexity under its own-language model is high is noisy).

    Scale shape: bigrams ride the q357 shingle law (map-side
    explode); every model table (bigram counts, history mass,
    continuation counts, type totals) is a hash groupBy keyed by
    (lang, token...), and scoring is three equi joins back on those
    keys — counts cross shuffles, never token streams.  No driver
    math, no iteration."""
    from ..operators.text import word_shingles

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    bg = docs.select(
        "lang",
        F.explode(word_shingles(tokens("text"), 2)).alias("s"),
    )
    sp = bg.select(
        "lang", "s",
        F.split_part(F.col("s"), F.lit(" "), F.lit(1)).alias("v"),
        F.split_part(F.col("s"), F.lit(" "), F.lit(2)).alias("w"),
    )
    big = sp.groupBy("lang", "s").agg(
        F.first("v").alias("v"),
        F.first("w").alias("w"),
        F.count("*").alias("n"),
    )
    hist = big.groupBy("lang", "v").agg(
        F.sum("n").cast("double").alias("c_v"),
        F.count("*").alias("n1p_fwd"),
    )
    cont = big.groupBy("lang", "w").agg(F.count("*").alias("n1p_back"))
    tot = big.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_types_d")
    )
    d = _Q373_D
    p = (
        big.join(hist, ["lang", "v"])
        .join(cont, ["lang", "w"])
        .join(tot, "lang")
        .select(
            "lang",
            "n",
            (
                F.greatest(F.col("n") - d, F.lit(0.0)) / F.col("c_v")
                + (F.lit(d) * F.col("n1p_fwd") / F.col("c_v"))
                * (F.col("n1p_back") / F.col("n_types_d"))
            ).alias("pkn"),
        )
    )
    nll = -F.sum(F.col("n") * F.log("pkn")) / F.sum("n")
    return p.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_types"),
        prnd(nll, 6).alias("nll"),
        prnd(F.exp(nll), 4).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# q376 Burrows' Delta stylometry between sources
# ---------------------------------------------------------------------------

# function-word panel (marker vocabulary; stylometry uses the most
# frequent function words, not content words)
_Q376_WORDS = tuple(
    sorted({t for ms in LANG_MARKERS.values() for t in ms})
)


def _q376_oracle() -> str:
    wl = _in_list(_Q376_WORDS)
    return f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    tots AS (SELECT source, count(*) AS n_tok FROM tok GROUP BY source),
    freq AS (
      SELECT t.source, t.tok AS w,
             CAST(count(*) AS DOUBLE) / any_value(s.n_tok) AS f
      FROM tok t JOIN tots s ON s.source = t.source
      WHERE t.tok IN {wl}
      GROUP BY t.source, t.tok
    ),
    grid AS (
      SELECT s.source, w.w, coalesce(f.f, 0.0) AS f
      FROM (SELECT source FROM tots) s
      CROSS JOIN (SELECT DISTINCT w FROM freq) w
      LEFT JOIN freq f ON f.source = s.source AND f.w = w.w
    ),
    stats AS (
      SELECT w, avg(f) AS mu, stddev_pop(f) AS sd
      FROM grid GROUP BY w HAVING stddev_pop(f) > 0
    ),
    z AS (
      SELECT g.source, g.w, (g.f - s.mu) / s.sd AS z
      FROM grid g JOIN stats s ON s.w = g.w
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_words,
           {o_rnd('avg(abs(a.z - b.z))', 6)} AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
    """


@query("q376_burrows_delta", oracle=_q376_oracle())
def q376_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (2002) — the standard stylometric distance:
    per-source relative frequencies of a function-word panel,
    z-scored against the cross-source distribution per word, and
    Delta(s1, s2) = mean |z1 - z2|.  The authorship/register
    fingerprint between SOURCES: two crawls with near-zero Delta are
    stylistic clones (likely mirrors even when content dedup misses
    them), high Delta flags register shifts — a corpus-composition
    signal next to q363's dataset card.

    Scale shape: token counting is a map-side filtered groupBy; the
    dense (source x word) grid is sources x panel-size rows (tiny —
    the corpus never materializes a grid), word stats are a groupBy
    over that grid, and the pairwise join is over the POST-AGGREGATE
    z frame keyed on the word — at 100 TB everything after the first
    rollup is dashboard-sized."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(tokens("text")).alias("tok"))
    tots = tok.groupBy("source").agg(F.count("*").alias("n_tok"))
    freq = (
        tok.filter(F.col("tok").isin(*_Q376_WORDS))
        .groupBy("source", F.col("tok").alias("w"))
        .agg(F.count("*").alias("c"))
        .join(tots, "source")
        .select(
            "source", "w",
            (F.col("c").cast("double") / F.col("n_tok")).alias("f"),
        )
    )
    grid = (
        tots.select("source")
        .crossJoin(F.broadcast(freq.select("w").distinct()))
        .join(freq, ["source", "w"], "left")
        .select("source", "w", F.coalesce("f", F.lit(0.0)).alias("f"))
    )
    stats = (
        grid.groupBy("w")
        .agg(F.avg("f").alias("mu"), F.stddev_pop("f").alias("sd"))
        .filter(F.col("sd") > 0)
    )
    z = grid.join(stats, "w").select(
        "source", "w", ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z")
    )
    a = z.select(F.col("source").alias("source_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "w", F.col("z").alias("zb"))
    return (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            prnd(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"),
        )
    )


# ---------------------------------------------------------------------------
# q378 CCNet-style perplexity buckets (head / middle / tail per language)
# ---------------------------------------------------------------------------


def _q378_oracle() -> str:
    d = _Q373_D
    return f"""
    WITH docs2 AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
    bgd AS (
      SELECT doc_id, lang,
             unnest(CASE WHEN len(toks) >= 2 THEN
                list_transform(range(1, len(toks)),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS s
      FROM docs2
    ),
    ev AS (SELECT doc_id, lang, s, count(*) AS n FROM bgd GROUP BY doc_id, lang, s),
    big AS (
      SELECT lang, s,
             string_split(s, ' ')[1] AS v, string_split(s, ' ')[2] AS w,
             sum(n) AS n
      FROM ev GROUP BY lang, s
    ),
    hist AS (
      SELECT lang, v, CAST(sum(n) AS DOUBLE) AS c_v, count(*) AS n1p_fwd
      FROM big GROUP BY lang, v
    ),
    cont AS (SELECT lang, w, count(*) AS n1p_back FROM big GROUP BY lang, w),
    tot AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_types FROM big GROUP BY lang),
    model AS (
      SELECT b.lang, b.s,
             (greatest(b.n - {d}, 0.0) / h.c_v)
             + ({d} * h.n1p_fwd / h.c_v) * (c.n1p_back / t.n_types) AS pkn
      FROM big b
      JOIN hist h ON h.lang = b.lang AND h.v = b.v
      JOIN cont c ON c.lang = b.lang AND c.w = b.w
      JOIN tot t ON t.lang = b.lang
    ),
    dnll AS (
      SELECT e.doc_id, e.lang,
             -sum(e.n * ln(m.pkn)) / sum(e.n) AS nll
      FROM ev e JOIN model m ON m.lang = e.lang AND m.s = e.s
      GROUP BY e.doc_id, e.lang
    ),
    b AS (
      SELECT lang, nll,
             ntile(3) OVER (PARTITION BY lang ORDER BY nll, doc_id) AS bucket
      FROM dnll
    )
    SELECT lang,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           {o_rnd('avg(nll)', 6)} AS avg_nll,
           {o_rnd('avg(exp(nll))', 4)} AS avg_ppl
    FROM b GROUP BY lang, bucket
    """


@query("q378_ccnet_buckets", oracle=_q378_oracle())
def q378_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality split (Wenzek et al. 2020): score every
    document's perplexity under ITS language's Kneser-Ney bigram LM
    (q373's model tables) and cut each language into head / middle /
    tail tertiles — the canonical LM-based curation stage (head =
    fluent text kept for pretraining, tail = noisy candidates for
    filtering), operating per-language so a hard language is not
    globally punished.

    Scale shape: the model tables are per-language hash groupBys;
    per-doc scoring is ONE equi join of (doc, bigram, count) eval
    rows against the (lang, bigram) model — bigram token streams
    never cross a shuffle unsummarized.  The tertile ntile runs over
    the per-DOC frame (corpus-size / ~500 rows); at extreme doc
    counts the q375 globalrank two-pass swaps in for the per-lang
    window unchanged."""
    from ..operators.text import word_shingles

    d = _Q373_D
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    bgd = docs.select(
        "doc_id", "lang",
        F.explode(word_shingles(tokens("text"), 2)).alias("s"),
    )
    # r12 pins (guide S2.4): ev (per-doc bigram counts) feeds both the
    # model-table chain and the per-doc scoring join, and big (the
    # per-lang bigram type table) feeds FOUR consumers (hist, cont,
    # tot, and the model join's left side) — un-pinned, the
    # tokenize+shingle+explode+agg chain re-ran five times in the
    # measured plan.  Both frames are aggregates far smaller than the
    # token stream they summarize, so the pins shrink state at scale.
    ev = pin_frame(
        bgd.groupBy("doc_id", "lang", "s").agg(F.count("*").alias("n"))
    )
    big = pin_frame(ev.groupBy("lang", "s").agg(
        F.sum("n").alias("n"),
        F.first(F.split_part(F.col("s"), F.lit(" "), F.lit(1))).alias("v"),
        F.first(F.split_part(F.col("s"), F.lit(" "), F.lit(2))).alias("w"),
    ))
    hist = big.groupBy("lang", "v").agg(
        F.sum("n").cast("double").alias("c_v"),
        F.count("*").alias("n1p_fwd"),
    )
    cont = big.groupBy("lang", "w").agg(F.count("*").alias("n1p_back"))
    tot = big.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_types_d")
    )
    model = (
        big.join(hist, ["lang", "v"])
        .join(cont, ["lang", "w"])
        .join(tot, "lang")
        .select(
            "lang", "s",
            (
                F.greatest(F.col("n") - d, F.lit(0.0)) / F.col("c_v")
                + (F.lit(d) * F.col("n1p_fwd") / F.col("c_v"))
                * (F.col("n1p_back") / F.col("n_types_d"))
            ).alias("pkn"),
        )
    )
    dnll = (
        ev.join(model, ["lang", "s"])
        .groupBy("doc_id", "lang")
        .agg(
            (-F.sum(F.col("n") * F.log("pkn")) / F.sum("n")).alias("nll")
        )
    )
    b = dnll.select(
        "lang", "nll",
        F.ntile(3)
        .over(W.partitionBy("lang").orderBy("nll", "doc_id"))
        .alias("bucket"),
    )
    return b.groupBy(
        "lang",
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        prnd(F.avg("nll"), 6).alias("avg_nll"),
        prnd(F.avg(F.exp("nll")), 4).alias("avg_ppl"),
    )


# ---------------------------------------------------------------------------
# q379 Self-BLEU corpus-diversity audit
# ---------------------------------------------------------------------------


def _q379_oracle() -> str:
    def grams(n: int) -> str:
        if n == 1:
            return "toks"
        return f"""CASE WHEN len(toks) >= {n} THEN
            list_transform(range(1, len(toks) - {n - 2}),
                i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))
            ELSE CAST([] AS VARCHAR[]) END"""
    ctes = []
    for n in (1, 2):
        ctes.append(f"""
    g{n} AS (
      SELECT doc_id, source, unnest({grams(n)}) AS g
      FROM docs2
    ),
    d{n} AS (SELECT doc_id, any_value(source) AS source, g, count(*) AS c
             FROM g{n} GROUP BY doc_id, g),
    t{n} AS (SELECT g, sum(c) AS tc FROM d{n} GROUP BY g),
    p{n} AS (
      SELECT d.doc_id, any_value(d.source) AS source,
             CAST(sum(least(d.c, t.tc - d.c)) AS DOUBLE)
               / sum(d.c) AS p
      FROM d{n} d JOIN t{n} t ON t.g = d.g
      GROUP BY d.doc_id
    )""")
    return f"""
    WITH docs2 AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    {", ".join(c.strip() for c in ctes)},
    sb AS (
      SELECT p1.doc_id, p1.source,
             sqrt(p1.p * p2.p) AS self_bleu
      FROM p1 JOIN p2 ON p2.doc_id = p1.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {o_rnd('avg(self_bleu)', 6)} AS avg_self_bleu,
           {o_rnd('CAST(count(*) FILTER (WHERE self_bleu > 0.5) AS DOUBLE) / count(*)', 6)} AS high_overlap_rate
    FROM sb GROUP BY source
    """


@query("q379_self_bleu", oracle=_q379_oracle())
def q379_self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU diversity audit (Zhu et al. 2018, texygen): each
    document's clipped 1/2-gram precision against the REST of the
    corpus (clip count = corpus count minus own count), geometric
    mean of the two precisions — high Self-BLEU = the corpus repeats
    itself (mode collapse in synthetic data, template farms in
    crawls); the per-source average and >0.5 share feed the dataset
    card next to q367's span coverage (which finds verbatim RUNS;
    Self-BLEU also catches bag-level repetition with no long run).

    Scale shape: pure count-table algebra — per-doc n-gram counts
    (map-side explode + groupBy), corpus totals (second groupBy on
    the gram), one equi join back on the gram key, and 'rest of
    corpus' falls out algebraically as tc - c with NO per-pair work
    (the leave-one-out law).  Nothing quadratic anywhere."""
    from ..operators.text import word_shingles

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "source", tokens("text").alias("toks"))
    ps = []
    for n in (1, 2):
        grams = (
            F.col("toks") if n == 1 else word_shingles(F.col("toks"), n)
        )
        d = (
            base.select(
                "doc_id", "source", F.explode(grams).alias("g")
            )
            .groupBy("doc_id", "g")
            .agg(F.first("source").alias("source"), F.count("*").alias("c"))
        )
        t = d.groupBy("g").agg(F.sum("c").alias("tc"))
        p = (
            d.join(t, "g")
            .groupBy("doc_id")
            .agg(
                F.first("source").alias("source"),
                (
                    F.sum(F.least(F.col("c"), F.col("tc") - F.col("c")))
                    .cast("double")
                    / F.sum("c")
                ).alias(f"p{n}"),
            )
        )
        ps.append(p)
    sb = (
        ps[0]
        .join(ps[1].select("doc_id", "p2"), "doc_id")
        .select(
            "source", F.sqrt(F.col("p1") * F.col("p2")).alias("self_bleu")
        )
    )
    return sb.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        prnd(F.avg("self_bleu"), 6).alias("avg_self_bleu"),
        prnd(
            F.count(F.when(F.col("self_bleu") > 0.5, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("high_overlap_rate"),
    )


# ---------------------------------------------------------------------------
# q382 log-odds keyness with informative Dirichlet prior
# ---------------------------------------------------------------------------

_Q382_ALPHA0 = 500.0   # prior mass (Monroe et al.'s a0)
_Q382_TOP = 5
_Q382_MIN_COUNT = 5    # ignore ultra-rare words


def _q382_oracle() -> str:
    a0 = _Q382_ALPHA0
    num = "(c_sw + a_w)"
    den = "(n_s + {a0} - c_sw - a_w)".format(a0=a0)
    numr = "(c_w - c_sw + a_w)"
    denr = "(n_tot - n_s + {a0} - (c_w - c_sw) - a_w)".format(a0=a0)
    delta = f"ln(CAST({num} AS DOUBLE) / {den}) - ln(CAST({numr} AS DOUBLE) / {denr})"
    z = f"({delta}) / sqrt(1.0 / {num} + 1.0 / {numr})"
    return f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    cw AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w
           HAVING count(*) >= {_Q382_MIN_COUNT}),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_tot FROM tok),
    ns AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_s FROM tok GROUP BY source),
    csw AS (
      SELECT t.source, t.w, count(*) AS c_sw
      FROM tok t JOIN cw ON cw.w = t.w
      GROUP BY t.source, t.w
    ),
    scored AS (
      SELECT c.source, c.w, c.c_sw, cw.c_w, ns.n_s, tot.n_tot,
             {a0} * cw.c_w / tot.n_tot AS a_w
      FROM csw c
      JOIN cw ON cw.w = c.w
      JOIN ns ON ns.source = c.source
      CROSS JOIN tot
    ),
    zs AS (
      SELECT source, w, c_sw, {o_rnd(z, 4)} AS z
      FROM scored
    ),
    ranked AS (
      SELECT source, w, c_sw, z,
             row_number() OVER (PARTITION BY source
                                ORDER BY z DESC, w) AS rk
      FROM zs
    )
    SELECT source, w AS keyword,
           CAST(c_sw AS BIGINT) AS count_in_source,
           z AS keyness_z,
           CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_Q382_TOP}
    """


@query("q382_log_odds_keyness", oracle=_q382_oracle())
def q382_log_odds_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyness via weighted log-odds with an informative Dirichlet
    prior (Monroe, Colaresi & Quinn 2008 'Fightin' Words'): for each
    source, the words most distinctive vs the REST of the corpus,
    scored by the prior-shrunk log-odds-ratio z — the principled
    replacement for raw TF-IDF keyword lists (q201) that neither
    over-rewards rare words (prior shrinkage) nor common ones
    (rest-of-corpus odds).  Rest-of-corpus counts fall out
    algebraically as c_w - c_sw (q379's leave-one-out law); the
    corpus-frequency prior a_w = a0 * c_w / N needs no fitting.

    Scale shape: two word-keyed groupBys (per-source and corpus),
    one equi join back on the word, broadcast scalar totals, then a
    per-source top-5 over the ROUNDED z (rounding before ranking
    pins the cross-engine order) — at 100 TB the rank is a per-source
    partial top-k."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(tokens("text")).alias("w"))
    cw = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c_w"))
        .filter(F.col("c_w") >= _Q382_MIN_COUNT)
    )
    tot = tok.agg(F.count("*").cast("double").alias("n_tot"))
    ns = tok.groupBy("source").agg(
        F.count("*").cast("double").alias("n_s")
    )
    csw = (
        tok.join(F.broadcast(cw.select("w")), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c_sw"))
    )
    a0 = _Q382_ALPHA0
    scored = (
        csw.join(cw, "w")
        .join(ns, "source")
        .crossJoin(F.broadcast(tot))
        .withColumn("a_w", F.lit(a0) * F.col("c_w") / F.col("n_tot"))
    )
    num = F.col("c_sw") + F.col("a_w")
    den = F.col("n_s") + a0 - F.col("c_sw") - F.col("a_w")
    numr = F.col("c_w") - F.col("c_sw") + F.col("a_w")
    denr = (
        F.col("n_tot") - F.col("n_s") + a0
        - (F.col("c_w") - F.col("c_sw")) - F.col("a_w")
    )
    delta = F.log(num.cast("double") / den) - F.log(numr.cast("double") / denr)
    z = delta / F.sqrt(1.0 / num + 1.0 / numr)
    zs = scored.select("source", "w", "c_sw", prnd(z, 4).alias("z"))
    ranked = zs.select(
        "source", "w", "c_sw", "z",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.col("z").desc(), "w"))
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= _Q382_TOP).select(
        "source",
        F.col("w").alias("keyword"),
        F.col("c_sw").cast("long").alias("count_in_source"),
        F.col("z").alias("keyness_z"),
        F.col("rk").cast("int").alias("rk"),
    )


# ---------------------------------------------------------------------------
# q389 TextTiling-style topic segmentation audit
# ---------------------------------------------------------------------------

_Q389_BLOCK = 20      # tokens per block
_Q389_VALLEY = 0.1    # Jaccard below this = topic boundary


def _q389_oracle() -> str:
    bsz = _Q389_BLOCK
    return f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    tok AS (
      SELECT doc_id, source,
             CAST(floor((generate_subscripts(toks, 1) - 1) / {bsz}) AS BIGINT) AS block,
             unnest(toks) AS tok
      FROM d
    ),
    bt AS (SELECT DISTINCT doc_id, source, block, tok FROM tok),
    bsize AS (
      SELECT doc_id, any_value(source) AS source, block, count(*) AS sz
      FROM bt GROUP BY doc_id, block
    ),
    inter AS (
      SELECT a.doc_id, a.block, count(*) AS ix
      FROM bt a JOIN bt b
        ON b.doc_id = a.doc_id AND b.tok = a.tok AND b.block = a.block + 1
      GROUP BY a.doc_id, a.block
    ),
    pairs AS (
      SELECT a.doc_id, a.source, a.block,
             CAST(coalesce(i.ix, 0) AS DOUBLE)
               / (a.sz + b.sz - coalesce(i.ix, 0)) AS jac
      FROM bsize a
      JOIN bsize b ON b.doc_id = a.doc_id AND b.block = a.block + 1
      LEFT JOIN inter i ON i.doc_id = a.doc_id AND i.block = a.block
    ),
    per_doc AS (
      SELECT doc_id, any_value(source) AS source,
             count(*) AS n_pairs, avg(jac) AS mean_jac,
             count(*) FILTER (WHERE jac < {_Q389_VALLEY}) AS n_boundaries
      FROM pairs GROUP BY doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_measured,
           {o_rnd('avg(mean_jac)', 6)} AS avg_block_jaccard,
           {o_rnd('avg(CAST(n_boundaries + 1 AS DOUBLE))', 6)} AS avg_segments,
           {o_rnd('CAST(count(*) FILTER (WHERE n_boundaries >= 1) AS DOUBLE) / count(*)', 6)} AS multi_topic_share
    FROM per_doc GROUP BY source
    """


@query("q389_texttiling", oracle=_q389_oracle())
def q389_texttiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling-style topic segmentation audit (Hearst 1997,
    set-overlap variant): cut each document into 20-token blocks,
    score adjacent-block cohesion by token-set Jaccard, and call a
    deep valley (< 0.1) a topic boundary — per-source mean cohesion,
    mean segment count and multi-topic share.  Multi-topic pages
    (navigation + article + comments) chunk badly (q83/q102
    consumers) and often indicate template scaffolding around thin
    content; Jaccard of integer set sizes keeps the valley test
    EXACT in both engines.

    Scale shape: all work is keyed by doc_id — block assignment is
    map-side position arithmetic, the adjacent-block intersection is
    a (doc, token)-keyed equi self-join between consecutive blocks
    (never across docs), and the rollups are two partial-agg
    groupBys.  Embarrassingly doc-parallel like q369."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "source",
        F.posexplode(tokens("text")).alias("i", "tok"),
    ).select(
        "doc_id", "source",
        F.floor(F.col("i") / _Q389_BLOCK).alias("block"),
        "tok",
    )
    bt = tok.select("doc_id", "source", "block", "tok").distinct()
    bsize = bt.groupBy("doc_id", "block").agg(
        F.first("source").alias("source"), F.count("*").alias("sz")
    )
    a = bt.alias("a")
    b = bt.select(
        "doc_id", "tok", (F.col("block") - 1).alias("block")
    ).alias("b")
    inter = (
        a.join(b, ["doc_id", "tok", "block"])
        .groupBy("doc_id", "block")
        .agg(F.count("*").alias("ix"))
    )
    nxt = bsize.select(
        "doc_id",
        (F.col("block") - 1).alias("block"),
        F.col("sz").alias("sz_b"),
    )
    pairs = (
        bsize.join(nxt, ["doc_id", "block"])
        .join(inter, ["doc_id", "block"], "left")
        .select(
            "doc_id", "source",
            (
                F.coalesce("ix", F.lit(0)).cast("double")
                / (F.col("sz") + F.col("sz_b") - F.coalesce("ix", F.lit(0)))
            ).alias("jac"),
        )
    )
    per_doc = pairs.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.avg("jac").alias("mean_jac"),
        F.count(F.when(F.col("jac") < _Q389_VALLEY, 1)).alias(
            "n_boundaries"
        ),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_measured"),
        prnd(F.avg("mean_jac"), 6).alias("avg_block_jaccard"),
        prnd(
            F.avg((F.col("n_boundaries") + 1).cast("double")), 6
        ).alias("avg_segments"),
        prnd(
            F.count(F.when(F.col("n_boundaries") >= 1, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("multi_topic_share"),
    )


# ---------------------------------------------------------------------------
# q390 curation-filter bias audit (keep-rate disparity by language)
# ---------------------------------------------------------------------------

_Q390_KEEP_AT = 0.75   # quality criteria needed to keep (3 of 4)
_Q390_Z = 1.96         # normal CI, pinned literal
_Q390_PARITY = 0.8     # four-fifths rule


def _q390_oracle() -> str:
    score = _quality_score_sql()
    return f"""
    WITH d AS (
      SELECT lang, CAST({score} >= {_Q390_KEEP_AT} AS INT) AS keep
      FROM documents
    ),
    per AS (
      SELECT lang, count(*) AS n, sum(keep) AS kept,
             CAST(sum(keep) AS DOUBLE) / count(*) AS p
      FROM d GROUP BY lang
    ),
    mx AS (SELECT max(p) AS pmax FROM per)
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           CAST(kept AS BIGINT) AS n_kept,
           {o_rnd('p', 6)} AS keep_rate,
           {o_rnd(f'{_Q390_Z} * sqrt(p * (1 - p) / n)', 6)} AS ci_halfwidth,
           {o_rnd('p / m.pmax', 6)} AS disparity_ratio,
           CAST(p / m.pmax < {_Q390_PARITY} AS INT) AS four_fifths_flag
    FROM per CROSS JOIN mx m
    """


@query("q390_filter_bias", oracle=_q390_oracle())
def q390_filter_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-filter bias audit: the q42 quality fence's keep rate
    per LANGUAGE, each language's disparity ratio vs the
    best-treated language, and the four-fifths flag (the classic
    adverse-impact test) with a normal CI on each rate — the check
    that a 'quality' filter is not quietly a language filter
    (documented failure mode of English-tuned heuristics on
    low-resource languages; cf. the fairness critiques of
    web-corpus filtering).  Keep decisions are exact quantized
    quarter-scores, so the 0.75 threshold is engine-exact.

    Scale shape: one map-side scored projection, one per-language
    partial agg, one broadcast scalar max — the q355 scalar-fold
    law; nothing beyond a single small shuffle."""
    from ..operators.text import quality_metrics

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    m = quality_metrics("text")
    keep = (quality_score(m) >= _Q390_KEEP_AT).cast("int")
    d = docs.select("lang", keep.alias("keep"))
    per = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("keep").alias("kept"),
        (F.sum("keep").cast("double") / F.count("*")).alias("p"),
    )
    mx = per.agg(F.max("p").alias("pmax"))
    return per.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.col("kept").cast("long").alias("n_kept"),
        prnd("p", 6).alias("keep_rate"),
        prnd(
            F.lit(_Q390_Z)
            * F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n")),
            6,
        ).alias("ci_halfwidth"),
        prnd(F.col("p") / F.col("pmax"), 6).alias("disparity_ratio"),
        (F.col("p") / F.col("pmax") < _Q390_PARITY)
        .cast("int")
        .alias("four_fifths_flag"),
    )


# ---------------------------------------------------------------------------
# q392 data-budget planner (epochs to exhaustion per source)
# ---------------------------------------------------------------------------

_Q392_BUDGET = 5_000_000   # target training-token budget
_Q392_MAX_EPOCHS = 4.0     # data-constrained repetition ceiling


def _q392_oracle() -> str:
    return f"""
    WITH src AS (
      SELECT source, sum(len({_TOKS_SQL})) AS toks, count(*) AS docs
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(toks) AS DOUBLE) AS y FROM src)
    SELECT source,
           CAST(docs AS BIGINT) AS n_docs,
           CAST(toks AS BIGINT) AS n_tokens,
           {o_rnd('toks / t.y', 6)} AS natural_share,
           {o_rnd(f'{_Q392_BUDGET} * (toks / t.y) / toks', 4)} AS epochs_at_natural,
           CAST({_Q392_BUDGET} * (toks / t.y) / toks > {_Q392_MAX_EPOCHS} AS INT) AS over_repeated,
           CAST(floor(least({_Q392_BUDGET} * (toks / t.y),
                            {_Q392_MAX_EPOCHS} * toks)) AS BIGINT) AS usable_tokens
    FROM src CROSS JOIN tot t
    """


@query("q392_data_budget", oracle=_q392_oracle())
def q392_data_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-budget planner: given a training-token budget consumed at
    each source's natural share, how many EPOCHS of that source get
    replayed — and cap the usable contribution at 4 epochs, past
    which repeated data stops helping (the data-constrained scaling
    law of Muennighoff et al. 2023).  The planner view a pretraining
    run reads next to the mixture weights (q88) and temperature
    resampling (q94): over_repeated sources need up-sampling of
    OTHER sources or more crawl, not more epochs.

    Scale shape: one map-side token count + per-source partial agg
    and a broadcast scalar total; epochs math is row-local
    arithmetic.  Note epochs_at_natural = budget/total regardless of
    source under natural sampling — the column exists because the
    same plan runs unchanged with ANY weight column replacing the
    natural share (the interesting case), and the cap then binds
    per source."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    src = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).alias("toks"),
        F.count("*").alias("docs"),
    )
    tot = src.agg(F.sum("toks").cast("double").alias("y"))
    b = float(_Q392_BUDGET)
    share = F.col("toks") / F.col("y")
    epochs = b * share / F.col("toks")
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("docs").cast("long").alias("n_docs"),
        F.col("toks").cast("long").alias("n_tokens"),
        prnd(share, 6).alias("natural_share"),
        prnd(epochs, 4).alias("epochs_at_natural"),
        (epochs > _Q392_MAX_EPOCHS).cast("int").alias("over_repeated"),
        F.floor(
            F.least(
                F.lit(b) * share, F.lit(_Q392_MAX_EPOCHS) * F.col("toks")
            )
        )
        .cast("long")
        .alias("usable_tokens"),
    )


# ---------------------------------------------------------------------------
# q397 lexical diversity (block TTR + Herdan's C)
# ---------------------------------------------------------------------------

_Q397_BLOCK = 25


def _q397_oracle() -> str:
    bsz = _Q397_BLOCK
    return f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    tok AS (
      SELECT doc_id, source,
             CAST(floor((generate_subscripts(toks, 1) - 1) / {bsz}) AS BIGINT) AS block,
             unnest(toks) AS tok
      FROM d
    ),
    doc AS (
      SELECT doc_id, any_value(source) AS source,
             count(*) AS n, count(DISTINCT tok) AS v
      FROM tok GROUP BY doc_id
    ),
    blk AS (
      SELECT doc_id, block, count(*) AS bn, count(DISTINCT tok) AS bv
      FROM tok GROUP BY doc_id, block HAVING count(*) = {bsz}
    ),
    mattr AS (
      SELECT doc_id, avg(CAST(bv AS DOUBLE) / bn) AS block_ttr
      FROM blk GROUP BY doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS docs,
           {o_rnd('avg(CAST(d.v AS DOUBLE) / d.n)', 6)} AS avg_ttr,
           {o_rnd('avg(CASE WHEN d.n > 1 THEN ln(d.v) / ln(d.n) END)', 6)} AS avg_herdan_c,
           {o_rnd('avg(m.block_ttr)', 6)} AS avg_block_ttr
    FROM doc d LEFT JOIN mattr m ON m.doc_id = d.doc_id
    GROUP BY d.source
    """


@query("q397_lexical_diversity", oracle=_q397_oracle())
def q397_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: raw type-token ratio, Herdan's C
    (ln V / ln N — the length-corrected TTR, the per-document dual
    of q345's corpus-level Heaps exponent) and 25-token block TTR
    (the length-robust estimator MATTR approximates) — the
    repetitive-vocabulary screen that separates template/boilerplate
    sources from genuine prose even when q86's repetition signals
    (exact repeats) miss paraphrase-level monotony.

    Scale shape: token explosion is map-side; per-doc and per-block
    distinct counts are doc-keyed hash groupBys; the source rollup
    is post-aggregate.  Doc-parallel like q369/q389."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "source",
        F.posexplode(tokens("text")).alias("i", "tok"),
    ).select(
        "doc_id", "source",
        F.floor(F.col("i") / _Q397_BLOCK).alias("block"),
        "tok",
    )
    doc = tok.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.count("*").alias("n"),
        F.countDistinct("tok").alias("v"),
    )
    blk = (
        tok.groupBy("doc_id", "block")
        .agg(F.count("*").alias("bn"), F.countDistinct("tok").alias("bv"))
        .filter(F.col("bn") == _Q397_BLOCK)
    )
    mattr = blk.groupBy("doc_id").agg(
        F.avg(F.col("bv").cast("double") / F.col("bn")).alias("block_ttr")
    )
    j = doc.join(mattr, "doc_id", "left")
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("docs"),
        prnd(F.avg(F.col("v").cast("double") / F.col("n")), 6).alias(
            "avg_ttr"
        ),
        prnd(
            F.avg(
                F.when(F.col("n") > 1, F.log("v") / F.log("n"))
            ),
            6,
        ).alias("avg_herdan_c"),
        prnd(F.avg("block_ttr"), 6).alias("avg_block_ttr"),
    )


# ---------------------------------------------------------------------------
# q398 lexical-vs-embedding similarity alignment
# ---------------------------------------------------------------------------

_Q398_SAMPLE = 25    # doc_id % SAMPLE == 0 enters the audit
_Q398_LEX_HI = 0.2   # lexical-similarity split point


def _q398_oracle() -> str:
    corr = ("(n * sxy - sx * sy) / "
            "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))")
    return f"""
    WITH d AS (
      SELECT doc_id, list_distinct({_TOKS_SQL}) AS ts
      FROM documents WHERE doc_id % {_Q398_SAMPLE} = 0
    ),
    tok AS (SELECT doc_id, unnest(ts) AS tok FROM d),
    sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
    ix AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM tok a JOIN tok b ON b.tok = a.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
    pairs AS (
      SELECT i.id_a, i.id_b,
             CAST(i.ix AS DOUBLE) / (sa.sz + sb.sz - i.ix) AS jac,
             list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))) AS cos
      FROM ix i
      JOIN sz sa ON sa.doc_id = i.id_a
      JOIN sz sb ON sb.doc_id = i.id_b
      JOIN ev ea ON ea.vec_id = i.id_a
      JOIN ev eb ON eb.vec_id = i.id_b
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(jac) AS sx, sum(cos) AS sy,
             sum(jac * jac) AS sxx, sum(cos * cos) AS syy,
             sum(jac * cos) AS sxy,
             avg(CASE WHEN jac >= {_Q398_LEX_HI} THEN cos END) AS hi,
             avg(CASE WHEN jac < {_Q398_LEX_HI} THEN cos END) AS lo
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           {o_rnd('sx / n', 6)} AS mean_jaccard,
           {o_rnd('sy / n', 6)} AS mean_cosine,
           {o_rnd(corr, 6)} AS alignment_corr,
           {o_rnd('hi', 6)} AS cos_lex_high,
           {o_rnd('lo', 6)} AS cos_lex_low
    FROM s
    """


@query("q398_similarity_alignment", oracle=_q398_oracle())
def q398_similarity_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation-faithfulness audit: over a hash sample of
    documents, correlate token-set Jaccard with embedding cosine on
    every lexically-overlapping pair (doc_id keys the embedding
    table) — a healthy embedding should rank lexical near-twins
    above strangers, so a LOW alignment correlation (or
    cos_lex_high ~ cos_lex_low) means the vectors don't reflect the
    text and every downstream ANN/dedup decision (q50/q52/q101) is
    built on sand.  Zero-overlap pairs are excluded by construction
    (the inverted index only emits sharing pairs).

    Scale shape: candidate pairs come from the token inverted index
    over a HASH-SAMPLED doc set (pair count bounded by the sample
    rate squared; the q44 df-cap applies to hot tokens at scale);
    Jaccard/cosine per pair via equi joins on doc id; the audit
    statistic is the q381 six-sum fold."""
    from ..operators.similarity import as_double_vec

    docs = spread_small_scan(table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % _Q398_SAMPLE == 0
    )
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    sz = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.select(
        F.col("doc_id").alias("id_b"), F.col("tok").alias("tok")
    ).alias("b")
    ix = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("id_b")))
        .groupBy(F.col("a.doc_id").alias("id_a"), "id_b")
        .agg(F.count("*").alias("ix"))
    )
    ev = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    pairs = (
        ix.join(sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza")), "id_a")
        .join(sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb")), "id_b")
        .join(ev.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(ev.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            (
                F.col("ix").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("ix"))
            ).alias("jac"),
            (
                dot(F.col("va"), F.col("vb"))
                / (
                    F.sqrt(dot(F.col("va"), F.col("va")))
                    * F.sqrt(dot(F.col("vb"), F.col("vb")))
                )
            ).alias("cos"),
        )
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    s = pairs.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("jac").alias("sx"), F.sum("cos").alias("sy"),
        F.sum(F.col("jac") * F.col("jac")).alias("sxx"),
        F.sum(F.col("cos") * F.col("cos")).alias("syy"),
        F.sum(F.col("jac") * F.col("cos")).alias("sxy"),
        F.avg(F.when(F.col("jac") >= _Q398_LEX_HI, F.col("cos"))).alias("hi"),
        F.avg(F.when(F.col("jac") < _Q398_LEX_HI, F.col("cos"))).alias("lo"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        prnd(F.col("sx") / F.col("n"), 6).alias("mean_jaccard"),
        prnd(F.col("sy") / F.col("n"), 6).alias("mean_cosine"),
        prnd(corr, 6).alias("alignment_corr"),
        prnd("hi", 6).alias("cos_lex_high"),
        prnd("lo", 6).alias("cos_lex_low"),
    )


# ---------------------------------------------------------------------------
# q399 lexical self-retrieval evaluation (MRR / recall@k)
# ---------------------------------------------------------------------------

_Q399_SAMPLE = 50   # doc_id % SAMPLE == 0 becomes a query
_Q399_TERMS = 3     # rarest distinct tokens per query doc
_Q399_K1, _Q399_B = 1.2, 0.75


def _q399_oracle() -> str:
    k1, b = _Q399_K1, _Q399_B
    return f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    tfs AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM toks)
      WHERE regexp_matches(term, '^[a-z0-9]+$')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfs GROUP BY term),
    qterm AS (
      SELECT doc_id AS qdoc, term, df FROM (
        SELECT f.doc_id, f.term, d.df,
               row_number() OVER (PARTITION BY f.doc_id
                                  ORDER BY d.df, f.term) AS rn
        FROM tfs f JOIN dfreq d USING (term)
        WHERE f.doc_id % {_Q399_SAMPLE} = 0
      ) WHERE rn <= {_Q399_TERMS}
    ),
    hits AS (
      SELECT q.qdoc, f.doc_id AS cand, q.term, f.tf, q.df
      FROM qterm q JOIN tfs f USING (term)
    ),
    scored AS (
      SELECT h.qdoc, h.cand,
             sum(ln((s.n_docs - h.df + 0.5) / (h.df + 0.5) + 1.0)
                 * h.tf * ({k1} + 1.0)
                 / (h.tf + {k1} * (1.0 - {b}
                       + {b} * CAST(d.dl AS DOUBLE) / s.avgdl))) AS score
      FROM hits h JOIN dl d ON d.doc_id = h.cand CROSS JOIN stats s
      GROUP BY h.qdoc, h.cand
    ),
    ranked AS (
      SELECT qdoc, cand,
             row_number() OVER (PARTITION BY qdoc
                                ORDER BY {o_rnd('score', 6)} DESC, cand) AS rk
      FROM scored
    ),
    self_rank AS (
      SELECT r.qdoc, r.rk, t.source
      FROM ranked r JOIN toks t ON t.doc_id = r.qdoc
      WHERE r.cand = r.qdoc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_queries,
           {o_rnd('avg(1.0 / rk)', 6)} AS mrr,
           {o_rnd('CAST(count(*) FILTER (WHERE rk = 1) AS DOUBLE) / count(*)', 6)} AS recall_at_1,
           {o_rnd('CAST(count(*) FILTER (WHERE rk <= 5) AS DOUBLE) / count(*)', 6)} AS recall_at_5
    FROM self_rank GROUP BY source
    """


@query("q399_self_retrieval", oracle=_q399_oracle())
def q399_self_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end lexical retrieval eval with the self-retrieval
    protocol: every 50th document becomes a query made of its own 3
    RAREST tokens, BM25 ranks the candidate set, and the metric is
    where the source document itself lands — MRR and recall@1/@5 per
    source.  No human labels needed, yet it exercises the whole
    retrieval stack (tokenization, df stats, posting join, BM25,
    ranking) and its failures are diagnostic: low recall = the
    'rare' tokens are boilerplate shared corpus-wide (q367/q379
    duplication showing up as retrieval confusion).

    Scale shape: candidates come from the inverted index joined on
    QUERY terms only (df-bounded by the rarest-term choice — the
    posting list of a rare token is short by definition); scoring is
    a (query, candidate) groupBy; the per-query rank window runs
    over candidate lists, not the corpus.  The protocol guarantees
    the truth doc is always in its own candidate set."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", tokens("text").alias("t")
    )
    # r12 pins (guide S2.4): the tokenize pass is the expensive leaf
    # here, and un-pinned it re-ran once per consumer — dl feeds the
    # corpus stats AND the per-candidate length join, tfs feeds the
    # document-frequency agg, the query-term pick and BOTH sides of
    # the posting join: 6 full tokenize+explode re-executions in the
    # measured plan.  dl is doc-grain (2 longs/row) and tfs is
    # (doc, term) grain — both bounded well under the corpus text
    # volume they replace, so the pins shrink state at any scale.
    dl = pin_frame(
        toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    )
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tfs = pin_frame(
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").rlike("^[a-z0-9]+$"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tfs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qterm = (
        tfs.filter(F.col("doc_id") % _Q399_SAMPLE == 0)
        .join(dfreq, "term")
        .select(
            F.col("doc_id").alias("qdoc"), "term", "df",
            F.row_number()
            .over(
                W.partitionBy("doc_id").orderBy("df", "term")
            )
            .alias("rn"),
        )
        .filter(F.col("rn") <= _Q399_TERMS)
    )
    hits = qterm.select("qdoc", "term", "df").join(
        tfs.select(F.col("doc_id").alias("cand"), "term", "tf"), "term"
    )
    k1, b = _Q399_K1, _Q399_B
    contrib = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        hits.join(dl.select(F.col("doc_id").alias("cand"), "dl"), "cand")
        .crossJoin(F.broadcast(stats))
        .groupBy("qdoc", "cand")
        .agg(F.sum(contrib).alias("score"))
    )
    ranked = scored.select(
        "qdoc", "cand",
        F.row_number()
        .over(
            W.partitionBy("qdoc").orderBy(
                prnd("score", 6).desc(), "cand"
            )
        )
        .alias("rk"),
    )
    self_rank = ranked.filter(F.col("cand") == F.col("qdoc")).join(
        toks.select(F.col("doc_id").alias("qdoc"), "source"), "qdoc"
    )
    return self_rank.groupBy("source").agg(
        F.count("*").cast("long").alias("n_queries"),
        prnd(F.avg(1.0 / F.col("rk")), 6).alias("mrr"),
        prnd(
            F.count(F.when(F.col("rk") == 1, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("recall_at_1"),
        prnd(
            F.count(F.when(F.col("rk") <= 5, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# q400 temperature-mixture materializer (deterministic resampling plan)
# ---------------------------------------------------------------------------

_Q400_T = 0.7            # sampling temperature
_Q400_BUDGET = 2_000_000  # target token budget


def _q400_oracle() -> str:
    from ..functions.portable import o_hash64

    u = f"(({o_hash64('doc_id')}) % 10000) / 10000.0"
    return f"""
    WITH d AS (
      SELECT doc_id, source, len({_TOKS_SQL}) AS ntok FROM documents
    ),
    src AS (
      SELECT source, CAST(sum(ntok) AS DOUBLE) AS ts, count(*) AS docs
      FROM d GROUP BY source
    ),
    tot AS (SELECT sum(ts) AS y FROM src),
    w AS (
      SELECT source, ts, docs, pow(ts / t.y, {_Q400_T}) AS wr
      FROM src CROSS JOIN tot t
    ),
    ws AS (SELECT sum(wr) AS z FROM w),
    plan AS (
      SELECT w.source, w.ts, w.docs, w.wr / s.z AS target_share,
             {_Q400_BUDGET} * (w.wr / s.z) / w.ts AS r
      FROM w CROSS JOIN ws s
    ),
    doc_copies AS (
      SELECT d.doc_id, d.source, d.ntok, p.target_share,
             CAST(floor(p.r) AS BIGINT)
               + CASE WHEN (p.r - floor(p.r)) > ({u}) THEN 1 ELSE 0 END
               AS copies
      FROM d JOIN plan p USING (source)
    ),
    outp AS (
      SELECT source, any_value(target_share) AS target_share,
             count(*) AS docs_in, sum(copies) AS docs_out,
             sum(ntok) AS tokens_in, sum(copies * ntok) AS tokens_out
      FROM doc_copies GROUP BY source
    ),
    ot AS (SELECT CAST(sum(tokens_out) AS DOUBLE) AS yo FROM outp)
    SELECT source,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(tokens_in AS BIGINT) AS tokens_in,
           CAST(tokens_out AS BIGINT) AS tokens_out,
           {o_rnd('target_share', 6)} AS target_share,
           {o_rnd('tokens_out / t.yo', 6)} AS achieved_share
    FROM outp CROSS JOIN ot t
    """


@query("q400_mixture_materializer", oracle=_q400_oracle())
def q400_mixture_materializer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixture MATERIALIZER: turn q94's temperature
    target (w_s proportional to share^0.7, T < 1 up-samples the
    tail) into an actual per-document replication plan — copies =
    floor(rate) + a deterministic hash-Bernoulli for the fraction
    (the q315 LCG-free variant: one md5 per doc, exact integer
    residue grid) — and audit achieved vs target token shares.
    This is the step that writes the training manifest; everything
    before it (q88/q94/q392) only plans.  Achieved share converges
    to target at corpus scale; the gap at small n IS the sampling
    noise the audit shows.

    Scale shape: per-source masses and weights are two tiny
    groupBys + broadcast scalars; the per-doc copies column is
    map-side arithmetic (the real run explodes sequence(1, copies)
    right here, same plan shape); the audit rollup is one partial
    agg.  No shuffle carries doc bodies."""
    from ..functions.portable import hash64

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("ntok")
    )
    src = d.groupBy("source").agg(
        F.sum("ntok").cast("double").alias("ts"),
        F.count("*").alias("docs"),
    )
    tot = src.agg(F.sum("ts").alias("y"))
    w = src.crossJoin(F.broadcast(tot)).select(
        "source", "ts",
        F.pow(F.col("ts") / F.col("y"), _Q400_T).alias("wr"),
    )
    ws = w.agg(F.sum("wr").alias("z"))
    plan = w.crossJoin(F.broadcast(ws)).select(
        "source",
        (F.col("wr") / F.col("z")).alias("target_share"),
        (
            F.lit(float(_Q400_BUDGET))
            * (F.col("wr") / F.col("z"))
            / F.col("ts")
        ).alias("r"),
    )
    u = (hash64("doc_id") % 10000) / 10000.0
    doc_copies = d.join(F.broadcast(plan), "source").select(
        "source", "ntok", "target_share",
        (
            F.floor("r").cast("long")
            + F.when(
                (F.col("r") - F.floor("r")) > u, F.lit(1)
            ).otherwise(0)
        ).alias("copies"),
    )
    outp = doc_copies.groupBy("source").agg(
        F.first("target_share").alias("target_share"),
        F.count("*").alias("docs_in"),
        F.sum("copies").alias("docs_out"),
        F.sum("ntok").alias("tokens_in"),
        F.sum(F.col("copies") * F.col("ntok")).alias("tokens_out"),
    )
    ot = outp.agg(F.sum("tokens_out").cast("double").alias("yo"))
    return outp.crossJoin(F.broadcast(ot)).select(
        "source",
        F.col("docs_in").cast("long").alias("docs_in"),
        F.col("docs_out").cast("long").alias("docs_out"),
        F.col("tokens_in").cast("long").alias("tokens_in"),
        F.col("tokens_out").cast("long").alias("tokens_out"),
        prnd("target_share", 6).alias("target_share"),
        prnd(F.col("tokens_out") / F.col("yo"), 6).alias("achieved_share"),
    )


# ---------------------------------------------------------------------------
# q406 greedy max-coverage document selection (coreset per source)
# ---------------------------------------------------------------------------

_Q406_ROUNDS = 3


def _q406_oracle() -> str:
    ctes = [
        f"dt AS (SELECT DISTINCT source, doc_id, unnest({_TOKS_SQL}) AS tok "
        "FROM documents)",
        "tot AS (SELECT source, count(DISTINCT tok) AS v FROM dt GROUP BY source)",
        "sel0 AS (SELECT source, CAST(NULL AS BIGINT) AS doc_id FROM tot WHERE 1=0)",
        "cov0 AS (SELECT source, tok FROM dt WHERE 1=0)",
    ]
    for t in range(1, _Q406_ROUNDS + 1):
        p = t - 1
        ctes.append(f"""gain{t} AS (
      SELECT d.source, d.doc_id, count(*) AS gain
      FROM dt d
      LEFT JOIN cov{p} c ON c.source = d.source AND c.tok = d.tok
      LEFT JOIN sel{p} s ON s.source = d.source AND s.doc_id = d.doc_id
      WHERE c.tok IS NULL AND s.doc_id IS NULL
      GROUP BY d.source, d.doc_id
    )""")
        ctes.append(f"""win{t} AS (
      SELECT source, doc_id, gain, {t} AS round FROM (
        SELECT source, doc_id, gain,
               row_number() OVER (PARTITION BY source
                                  ORDER BY gain DESC, doc_id) AS rn
        FROM gain{t}
      ) WHERE rn = 1
    )""")
        ctes.append(
            f"sel{t} AS (SELECT source, doc_id FROM sel{p} "
            f"UNION ALL SELECT source, doc_id FROM win{t})"
        )
        ctes.append(f"""cov{t} AS (
      SELECT source, tok FROM cov{p}
      UNION
      SELECT d.source, d.tok FROM dt d
      JOIN win{t} w ON w.source = d.source AND w.doc_id = d.doc_id
    )""")
    wins = " UNION ALL ".join(
        f"SELECT source, round, doc_id, gain FROM win{t}"
        for t in range(1, _Q406_ROUNDS + 1)
    )
    return f"""
    WITH {", ".join(ctes)},
    allw AS ({wins}),
    cum AS (
      SELECT source, round, doc_id, gain,
             sum(gain) OVER (PARTITION BY source ORDER BY round) AS cum_cov
      FROM allw
    )
    SELECT c.source, CAST(c.round AS INTEGER) AS round,
           CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(c.gain AS BIGINT) AS gain,
           {o_rnd('CAST(c.cum_cov AS DOUBLE) / t.v', 6)} AS coverage
    FROM cum c JOIN tot t ON t.source = c.source
    """


@query("q406_greedy_coverage", oracle=_q406_oracle())
def q406_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage document selection per source (the
    facility-location/coreset primitive of data selection): three
    greedy rounds, each picking the document adding the most
    NOT-YET-COVERED distinct tokens — the classic (1-1/e)-optimal
    submodular greedy, the batch version of 'pick k representative
    docs per source' used for eval-set seeding, annotation
    budgeting and dataset cards.  Output: the picks, marginal
    gains (non-increasing by submodularity — asserted in the
    invariants test) and cumulative vocabulary coverage.

    Scale shape: each round is one anti-join of the doc-token
    posting list against the covered-token set (both keyed (source,
    tok)), a doc-level count, and a per-source argmax (k-row
    frame); the covered set grows by <= 1 doc's tokens per source
    per round.  Rounds are bounded (3) and each is a fixed
    plan stage — same unrolled-iteration law as q393."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    # pinned (r12, guide S2.4): the doc-token posting list feeds every
    # round's candidate anti-joins, every round's coverage join-back
    # and the per-source vocabulary total — 7 consumers re-ran the
    # tokenize+explode+DISTINCT (a full shuffle each) per round; the
    # distinct frame is aggregated (the q348 pin class), far smaller
    # than the token stream that builds it
    dt = (
        docs.select(
            "source",
            "doc_id",
            F.explode(F.array_distinct(tokens("text"))).alias("tok"),
        )
        .distinct()
        .transform(pin_frame)
    )
    tot = dt.groupBy("source").agg(F.countDistinct("tok").alias("v"))
    covered = None
    selected = None
    wins = []
    for t in range(1, _Q406_ROUNDS + 1):
        cand = dt
        if selected is not None:
            cand = cand.join(selected, ["source", "doc_id"], "left_anti")
        if covered is not None:
            cand = cand.join(covered, ["source", "tok"], "left_anti")
        gain = cand.groupBy("source", "doc_id").agg(
            F.count("*").alias("gain")
        )
        win = (
            gain.select(
                "source", "doc_id", "gain",
                F.row_number()
                .over(
                    W.partitionBy("source").orderBy(
                        F.col("gain").desc(), "doc_id"
                    )
                )
                .alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .select("source", "doc_id", "gain", F.lit(t).alias("round"))
            .transform(pin_frame_lazy)
        )
        wins.append(win)
        new_cov = dt.join(
            win.select("source", "doc_id"), ["source", "doc_id"]
        ).select("source", "tok")
        covered = (
            new_cov if covered is None
            else covered.unionByName(new_cov).distinct()
        )
        selected = (
            win.select("source", "doc_id") if selected is None
            else selected.unionByName(win.select("source", "doc_id"))
        )
    allw = wins[0]
    for w_ in wins[1:]:
        allw = allw.unionByName(w_)
    cum = allw.select(
        "source", "round", "doc_id", "gain",
        F.sum("gain")
        .over(W.partitionBy("source").orderBy("round"))
        .alias("cum_cov"),
    )
    return cum.join(tot, "source").select(
        "source",
        F.col("round").cast("int").alias("round"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("gain").cast("long").alias("gain"),
        prnd(F.col("cum_cov").cast("double") / F.col("v"), 6).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# q407 vocabulary coverage curve (top-V type share of token mass)
# ---------------------------------------------------------------------------

_Q407_SIZES = (100, 1000, 4000)


def _q407_oracle() -> str:
    cols = ", ".join(
        o_rnd(
            f"sum(CASE WHEN rk <= {v} THEN cnt ELSE 0 END)"
            f" / CAST(sum(cnt) AS DOUBLE)",
            6,
        )
        + f" AS cov_{v}"
        for v in _Q407_SIZES
    )
    return f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    types AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rk
      FROM types
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           {cols}
    FROM ranked
    """


@query("q407_vocab_coverage", oracle=_q407_oracle())
def q407_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of the corpus token
    mass the top-100 / top-1000 / top-4000 types capture — the
    first number a tokenizer-size decision needs (a corpus where 4k
    types cover 99% wastes a 64k vocab; one where they cover 80%
    will fragment words into chars), complementing q264's Zipf
    exponent with the decision-ready cumulative view and q140's
    fixed-vocab OOV rate with the full curve.

    Scale shape: one type-count groupBy; the rank over TYPES routes
    through operators/globalrank (r6 — the vocabulary is sub-linear
    by Heaps' law but unbounded, so it never sits in a single-task
    window), then one conditional-sum fold."""
    from ..operators.globalrank import with_global_row_stats

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    types = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = with_global_row_stats(
        types, [F.col("cnt").desc(), "tok"], rank_col="rk"
    ).select("cnt", "rk")
    aggs = [
        F.count("*").cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    ]
    for v in _Q407_SIZES:
        aggs.append(
            prnd(
                F.sum(F.when(F.col("rk") <= v, F.col("cnt")).otherwise(0))
                / F.sum("cnt").cast("double"),
                6,
            ).alias(f"cov_{v}")
        )
    return ranked.agg(*aggs)


# ---------------------------------------------------------------------------
# q412 uncertainty sampling (active-learning annotation queue)
# ---------------------------------------------------------------------------

_Q412_TOP = 10


def _q412_oracle() -> str:
    score_cols = ", ".join(
        f"CAST(len(list_filter(toks, t -> t IN {_in_list(LANG_MARKERS[lang])})) AS INTEGER) AS s_{lang}"
        for lang in LANG_PRIORITY
    )
    arr = "[" + ", ".join(f"s_{lang}" for lang in LANG_PRIORITY) + "]"
    return f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, source, {score_cols} FROM d),
    m AS (
      SELECT doc_id, source,
             list_sort({arr}, 'DESC') AS sl
      FROM s
    ),
    marg AS (
      SELECT doc_id, source,
             CAST(sl[1] AS BIGINT) AS top_score,
             CAST(sl[1] - sl[2] AS BIGINT) AS margin
      FROM m
    ),
    ranked AS (
      SELECT doc_id, source, top_score, margin,
             row_number() OVER (ORDER BY margin, top_score, doc_id) AS rk
      FROM marg
    )
    SELECT CAST(rk AS INTEGER) AS rk,
           CAST(doc_id AS BIGINT) AS doc_id,
           source, top_score, margin
    FROM ranked WHERE rk <= {_Q412_TOP}
    """


@query("q412_uncertainty_sampling", oracle=_q412_oracle())
def q412_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for the annotation queue (classic active
    learning): rank documents by the MARGIN between the language-ID
    classifier's top two marker scores (q41's feature set) — the
    smallest-margin docs are where a human label buys the most model
    improvement, and ambiguous/low-evidence docs (margin 0, top
    score 0) surface first, which doubles as the q202-confusion
    triage queue.  Output: the top-10 queue with scores.

    Scale shape: marker scoring is array-HOF arithmetic in the scan
    (q41's zero-shuffle law); the queue is a TakeOrdered partial
    top-k (q380 law) — margin ties broken by top_score then doc_id
    so both engines enqueue identically."""
    from ..operators.text import lang_scores

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    sc = lang_scores(tokens("text"))
    arr = F.sort_array(
        F.array(*[sc[lang] for lang in LANG_PRIORITY]), asc=False
    )
    marg = docs.select(
        "doc_id", "source",
        F.element_at(arr, 1).cast("long").alias("top_score"),
        (F.element_at(arr, 1) - F.element_at(arr, 2))
        .cast("long")
        .alias("margin"),
    )
    top = (
        marg.orderBy("margin", "top_score", "doc_id")
        .limit(_Q412_TOP)
        .select(
            F.row_number()
            .over(W.orderBy("margin", "top_score", "doc_id"))
            .cast("int")
            .alias("rk"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "source", "top_score", "margin",
        )
    )
    return top


# ---------------------------------------------------------------------------
# q417 lineage attestation manifest (stage hashes of the curation funnel)
# ---------------------------------------------------------------------------

_Q417_MOD = (1 << 61) - 1  # Mersenne prime modulus for the rolling sum


def _q417_oracle() -> str:
    from ..functions.portable import o_hash64

    row_h = o_hash64("CAST(doc_id AS VARCHAR) || ':' || text")
    score = _quality_score_sql()
    return f"""
    WITH raw AS (
      SELECT doc_id, text, source, ({row_h}) % {_Q417_MOD} AS rh,
             {score} AS q
      FROM documents
    ),
    fenced AS (SELECT * FROM raw WHERE q >= 0.75),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
        FROM fenced
      ) WHERE rn = 1
    ),
    stages AS (
      SELECT 1 AS stage_no, 'raw' AS stage, count(*) AS rows_out,
             sum(rh) % {_Q417_MOD} AS content_sum FROM raw
      UNION ALL
      SELECT 2, 'quality_fence', count(*), sum(rh) % {_Q417_MOD} FROM fenced
      UNION ALL
      SELECT 3, 'exact_dedup', count(*), sum(rh) % {_Q417_MOD} FROM deduped
    )
    SELECT CAST(stage_no AS INTEGER) AS stage_no, stage,
           CAST(rows_out AS BIGINT) AS rows_out,
           CAST(content_sum AS BIGINT) AS content_sum,
           md5(CAST(sum(content_sum)
                 OVER (ORDER BY stage_no) % {_Q417_MOD} AS VARCHAR))
             AS chained_hash
    FROM stages
    """


@query("q417_lineage_manifest", oracle=_q417_oracle())
def q417_lineage_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage attestation manifest: run the raw -> quality-fence ->
    exact-dedup funnel and emit, per stage, the row count, an
    ORDER-INDEPENDENT content checksum (sum of per-row 60-bit hashes
    mod a Mersenne prime — commutative, so partitioning cannot
    change it), and a chained hash over the stage prefix — the
    verifiable 'what exactly went into this dataset' receipt that
    reproducibility audits and q363's dataset card attach.  Re-run
    the pipeline anywhere: equal chained hashes = bit-identical
    lineage; q244's table checksum applied to a PIPELINE.

    Scale shape: one md5 per surviving row per stage membership
    (computed once in the shared scan), stage checksums are partial
    sums, dedup keeps-first via the q43 fingerprint window; the
    chaining window runs over the 3-row stage frame."""
    from ..functions.portable import hash64

    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    from ..operators.text import quality_metrics

    m = quality_metrics("text")
    raw = docs.select(
        "doc_id", "text",
        (
            hash64(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                )
            )
            % _Q417_MOD
        ).alias("rh"),
        quality_score(m).alias("q"),
    )
    fenced = raw.filter(F.col("q") >= 0.75)
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    deduped = (
        fenced.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(fp).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )

    def stage(df, no, name):
        return df.agg(
            F.lit(no).cast("int").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("rows_out"),
            # decimal(38) accumulator: the modular checksum must not
            # overflow int64 at any row count (DuckDB sums to HUGEINT)
            (F.sum(F.col("rh").cast("decimal(38,0)")) % _Q417_MOD)
            .cast("long")
            .alias("content_sum"),
        )

    stages = (
        stage(raw, 1, "raw")
        .unionByName(stage(fenced, 2, "quality_fence"))
        .unionByName(stage(deduped, 3, "exact_dedup"))
    )
    chained = F.md5(
        (
            F.sum("content_sum").over(W.orderBy("stage_no")) % _Q417_MOD
        ).cast("string")
    )
    return stages.select(
        "stage_no", "stage", "rows_out", "content_sum",
        chained.alias("chained_hash"),
    )


# ---------------------------------------------------------------------------
# q418 knee-point detection on the vocabulary coverage curve
# ---------------------------------------------------------------------------

_Q418_SIZES = (50, 100, 200, 400, 800, 1600, 3200, 6400)
import math as _math418

_Q418_LOGV = tuple(round(_math418.log(v), 12) for v in _Q418_SIZES)


def _q418_oracle() -> str:
    cov_rows = " UNION ALL ".join(
        f"SELECT {v} AS vsize, {lv} AS lx, "
        f"sum(CASE WHEN rk <= {v} THEN cnt ELSE 0 END)"
        f" / CAST(sum(cnt) AS DOUBLE) AS cov FROM ranked"
        for v, lv in zip(_Q418_SIZES, _Q418_LOGV)
    )
    x0, x1 = _Q418_LOGV[0], _Q418_LOGV[-1]
    xn = f"((lx - {x0}) / ({x1} - {x0}))"
    chord = f"(c0.y0 + ({xn}) * (c1.y1 - c0.y0))"
    dist = f"(cov - {chord})"
    return f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    types AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rk
      FROM types
    ),
    curve AS ({cov_rows}),
    ends AS (
      SELECT
        (SELECT cov FROM curve WHERE vsize = {_Q418_SIZES[0]}) AS y0,
        (SELECT cov FROM curve WHERE vsize = {_Q418_SIZES[-1]}) AS y1
    ),
    d AS (
      SELECT c.vsize, c.cov, {dist} AS dist
      FROM curve c
      CROSS JOIN (SELECT y0 FROM ends) c0
      CROSS JOIN (SELECT y1 FROM ends) c1
    ),
    mx AS (SELECT max(dist) AS md FROM d)
    SELECT CAST(d.vsize AS INTEGER) AS vocab_size,
           {o_rnd('d.cov', 6)} AS coverage,
           {o_rnd('d.dist', 6)} AS knee_distance,
           CAST(d.dist = m.md AS INT) AS is_knee
    FROM d CROSS JOIN mx m
    """


@query("q418_coverage_knee", oracle=_q418_oracle())
def q418_coverage_knee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knee-point detection (Kneedle, simplified) on the vocabulary
    coverage curve: compute token-mass coverage at 8 log-spaced
    vocabulary sizes and flag the size with maximum vertical
    distance above the log-x chord — the principled 'diminishing
    returns start HERE' answer to how big the tokenizer vocabulary
    should be, upgrading q407's three fixed read-outs to an actual
    decision rule (the same knee test applies to any concave
    operating curve: q359's dedup sweep, q334's threshold sweep).

    Scale shape: one type-count groupBy and one vocabulary-frame
    rank window (q407's law) feed all 8 sizes via conditional sums
    in a single pass; the knee geometry runs on the 8-row curve
    with broadcast endpoint/max scalars.  Log-x values are pinned
    Python literals."""
    docs = spread_small_scan(table(spark, sf_dir, "documents"))
    types = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = types.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rk"),
    )
    aggs = []
    for v in _Q418_SIZES:
        aggs.append(
            (
                F.sum(F.when(F.col("rk") <= v, F.col("cnt")).otherwise(0))
                / F.sum("cnt").cast("double")
            ).alias(f"c_{v}")
        )
    wide = ranked.agg(*aggs)
    structs = [
        F.struct(
            F.lit(v).alias("vsize"),
            F.lit(lv).alias("lx"),
            F.col(f"c_{v}").alias("cov"),
        )
        for v, lv in zip(_Q418_SIZES, _Q418_LOGV)
    ]
    curve = wide.select(
        F.explode(F.array(*structs)).alias("x")
    ).select("x.*")
    x0, x1 = _Q418_LOGV[0], _Q418_LOGV[-1]
    ends = curve.agg(
        F.max(
            F.when(F.col("vsize") == _Q418_SIZES[0], F.col("cov"))
        ).alias("y0"),
        F.max(
            F.when(F.col("vsize") == _Q418_SIZES[-1], F.col("cov"))
        ).alias("y1"),
    )
    xn = (F.col("lx") - x0) / (x1 - x0)
    d = curve.crossJoin(F.broadcast(ends)).select(
        "vsize", "cov",
        (
            F.col("cov")
            - (F.col("y0") + xn * (F.col("y1") - F.col("y0")))
        ).alias("dist"),
    )
    mx = d.agg(F.max("dist").alias("md"))
    return d.crossJoin(F.broadcast(mx)).select(
        F.col("vsize").cast("int").alias("vocab_size"),
        prnd("cov", 6).alias("coverage"),
        prnd("dist", 6).alias("knee_distance"),
        (F.col("dist") == F.col("md")).cast("int").alias("is_knee"),
    )
