"""q249 BPE training: the r13 regex-greedy engine must be
round-for-round identical to the r12 window/island reference.

The rewrite (plans/textprep_q.py:_q249_train_rounds) replaces the
posexplode + lead + island/parity windows + position joins with one
``regexp_replace`` per round over a sentinel-wrapped per-doc string.
The equivalence claim rests on Java's ``replaceAll`` being leftmost
non-overlapping with scanning resuming AFTER each match — exactly the
island-parity semantics of a sequential greedy BPE merge.  This suite
drives both engines over corpora built to break that claim:

- overlapping runs ('x x x', 'x x x x') where parity is the whole game
- disjoint adjacent matches ('a b a b') that must BOTH merge (the
  lookaround boundaries consume no separator)
- regex metacharacters in tokens (Pattern.quote escaping) and '$' /
  backslash in the merged token (Matcher.quoteReplacement escaping)
- a literal '\\E' inside a token (the one string Pattern.quote must
  split around)
- empty tokens from doubled spaces, and ties in the pair counts
  (deterministic (n_occ desc, a, b) tie-break on both sides)
- merged '~' tokens feeding later rounds
"""
from __future__ import annotations

from crypto_prediction_etl_spark.plans.textprep_q import (
    _q249_spark_round,
    _q249_train_rounds,
)
from crypto_prediction_etl_spark.operators.text import tokens


def _reference_rounds(spark, docs, rounds: int):
    """The r12 window/island loop, unchanged, as the ground truth."""
    from crypto_prediction_etl_spark.pinning import pin_loop

    toks_df = docs.select("doc_id", tokens("text").alias("toks"))
    outs = []
    for r in range(1, rounds + 1):
        summary, toks_df = _q249_spark_round(spark, toks_df, r)
        outs.append(summary)
        if r < rounds:
            toks_df = toks_df.transform(pin_loop)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


CORPORA = {
    "overlap_runs": [
        (1, "x x x"),
        (2, "x x x x"),
        (3, "x x x x x"),
        (4, "y x x y"),
    ],
    "disjoint_adjacent": [
        (1, "a b a b a b"),
        (2, "a b c a b"),
        (3, "b a b a"),
    ],
    "regex_metachars": [
        (1, "a.b a.b c$ c$ c$"),
        (2, "(x) (x) a.b a.b"),
        (3, "\\q \\q \\E \\E a.b"),
        (4, "$1 $1 $1 \\q \\E"),
    ],
    "ties_and_empties": [
        (1, "a b  a b"),  # double space -> empty token between pairs
        (2, "b a b a"),
        (3, " a b"),  # leading space -> leading empty token
        (4, "CASE case Case case"),  # lowercasing feeds the counts
    ],
    "chained_merges": [
        (1, "t h e t h e t h e"),
        (2, "t h t h e e"),
        (3, "the t h e"),
    ],
}


def test_q249_regex_engine_matches_window_reference(spark):
    for label, rows in CORPORA.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(_q249_train_rounds(docs, 3).collect())
        ref = sorted(_reference_rounds(spark, docs, 3).collect())
        assert got == ref, f"corpus {label}: {got} != {ref}"


def test_q249_regex_engine_matches_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(_q249_train_rounds(docs, 3).collect())
    ref = sorted(_reference_rounds(spark, docs, 3).collect())
    assert got == ref
