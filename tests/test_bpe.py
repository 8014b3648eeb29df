"""textops.bpe_pair_topk: weighted adjacent-pair counts over the
word-frequency relation."""

from __future__ import annotations

from cdc_engine.textops import bpe_pair_topk


def test_bpe_pair_counts_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "abc ab x"), (2, "abc bc"), (3, "ab")],
        "doc_id int, text string",
    )
    # word freqs: abc=2, ab=2, bc=1, x=1 (single char -> no pairs)
    # pair weights: ab = 2(abc) + 2(ab) = 4; bc = 2(abc) + 1(bc) = 3
    out = [(r["pair"], r["n"]) for r in bpe_pair_topk(docs, k=10).collect()]
    assert out == [("ab", 4), ("bc", 3)]


def test_bpe_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame([(1, "zz aa")], "doc_id int, text string")
    out = [(r["pair"], r["n"]) for r in bpe_pair_topk(docs, k=2).collect()]
    assert out == [("aa", 1), ("zz", 1)]
