"""span_hash_rows (mapInPandas md5 kernel) must be bit-identical to
the JVM expression form it replaced in q367:
``explode(word_shingles(tokens(text), k)) -> hash64``.

The kernel exists purely for speed (guide S4.2: 2.55 s -> 0.39 s at
sf0.1 on the map side); any value drift would silently change span
coverage, so identity is asserted exhaustively (exceptAll both ways)
on the real corpus fixture plus hand-built edge docs: multi-space
runs (empty tokens — Python ``split(" ")`` must keep them exactly
like Java split with limit -1), docs shorter than k, exactly k, and
empty text.
"""

from pyspark.sql import functions as F

from crypto_prediction_etl_spark.functions.portable import hash64
from crypto_prediction_etl_spark.operators.text import (
    span_hash_rows,
    tokens,
    with_word_shingles,
    word_shingles,
)


def _expr_form(docs, k):
    return (
        with_word_shingles(
            docs.select("doc_id", tokens("text").alias("_toks")), "_toks", k, "shs"
        )
        .select("doc_id", F.explode("shs").alias("s"))
        .select("doc_id", hash64("s").alias("h"))
    )


def test_span_kernel_bit_identical_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 8
    kern = span_hash_rows(docs, k)
    expr = _expr_form(docs, k)
    assert kern.count() == expr.count()
    assert kern.exceptAll(expr).count() == 0
    assert expr.exceptAll(kern).count() == 0


def test_span_kernel_edge_docs(spark):
    rows = [
        (1, "a  b c d e f g h i"),  # double space -> empty token
        (2, "one two three"),  # shorter than k
        (3, "a b c d e f g h"),  # exactly k tokens
        (4, ""),  # empty text -> [''] single token
        (5, " leading and trailing "),  # boundary empties
        (6, "A B c D e F g H i J"),  # lowercasing
        (7, None),  # NULL text: dropped, not crashed (ADVICE r12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k = 8
    kern = span_hash_rows(docs, k)
    expr = _expr_form(docs, k)
    assert sorted(kern.collect()) == sorted(expr.collect())


def test_doubling_ladder_matches_chained(spark):
    rows = [("a b c d e f g h i j",), ("x y",), ("",)]
    df = spark.createDataFrame(rows, "text string").select(
        F.split("text", " ").alias("_toks")
    )
    for n in (4, 8):
        old = [r.s for r in df.select(word_shingles(F.col("_toks"), n).alias("s")).collect()]
        new = [
            r.s
            for r in with_word_shingles(df, "_toks", n, "s").select("s").collect()
        ]
        assert old == new


def test_simhash_kernel_matches_expression_form(spark, sf_dir):
    from crypto_prediction_etl_spark.operators.dedup import (
        _simhash_signatures_expr,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kern = sorted(simhash_signatures(docs, bits=32).collect())
    expr = sorted(_simhash_signatures_expr(docs, bits=32).collect())
    assert kern == expr
    edge = spark.createDataFrame(
        [(1, "a  b"), (2, ""), (3, "ONE two Three"), (4, " x "), (5, None)],
        "doc_id long, text string",
    )
    assert sorted(simhash_signatures(edge, bits=32).collect()) == sorted(
        _simhash_signatures_expr(edge, bits=32).collect()
    )


def test_minhash_kernel_matches_expression_form(spark, sf_dir):
    """r13 kernel (VERDICT r12 item 1): the mapInPandas minhash
    signature derivation must be bit-identical to the JVM
    hash-explode-groupBy reference on the real corpus arrays and on
    hand-built edges (empty / NULL shingle arrays drop the doc in both
    forms; single-shingle docs take that shingle's 16 permuted hashes
    verbatim)."""
    from crypto_prediction_etl_spark.operators.dedup import (
        _minhash_sigs_from_arrays,
        _minhash_sigs_from_arrays_expr,
        doc_shingle_arrays,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arrays = doc_shingle_arrays(docs, 3, nonempty=True)
    kern = sorted(_minhash_sigs_from_arrays(arrays, "doc_id").collect())
    expr = sorted(_minhash_sigs_from_arrays_expr(arrays, "doc_id").collect())
    assert kern and kern == expr
    edge = spark.createDataFrame(
        [
            (1, ["a b c", "b c d"]),
            (2, []),
            (3, None),
            (4, ["lone shingle x"]),
            (5, ["", " ", "a  b"]),  # empty/whitespace shingles still hash
        ],
        "doc_id long, shingles array<string>",
    )
    ek = sorted(_minhash_sigs_from_arrays(edge, "doc_id").collect())
    ee = sorted(_minhash_sigs_from_arrays_expr(edge, "doc_id").collect())
    assert [r.doc_id for r in ek] == [1, 4, 5]
    assert ek == ee
