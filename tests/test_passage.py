"""dedup_text.dup_passage_stats: exact-substring passage scrub.

Hand-built corpus with a known shared 10-token passage: coverage must be
exactly the passage tokens in both docs (k=8 grams tile it), unique text
survives, a fully-duplicated doc scrubs to the md5('') sentinel, and
short/empty docs are stable.
"""

from __future__ import annotations

import hashlib

from cdc_engine.dedup_text import dup_passage_stats

EMPTY_MD5 = hashlib.md5(b"").hexdigest()

PASSAGE = "the quick brown fox jumps over the lazy sleeping dog"  # 10 tokens


def test_known_shared_passage_scrubbed_exactly(spark):
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {PASSAGE} delta epsilon"),
            (2, f"one two three four five six seven {PASSAGE}"),
            (3, "totally unique text with eight distinct tokens only here"),
            (4, PASSAGE),          # nothing but the shared passage
            (5, "tiny doc"),       # shorter than k: no grams, never dup
            (6, ""),               # empty
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dup_passage_stats(docs, k=8).collect()}
    assert out[1]["n_tokens"] == 15 and out[1]["dup_tokens"] == 10
    assert out[2]["n_tokens"] == 17 and out[2]["dup_tokens"] == 10
    assert out[3]["dup_tokens"] == 0
    assert out[4]["n_tokens"] == 10 and out[4]["dup_tokens"] == 10
    assert out[4]["scrub_hash"] == EMPTY_MD5
    assert out[5]["n_tokens"] == 2 and out[5]["dup_tokens"] == 0
    assert out[6]["n_tokens"] == 0 and out[6]["scrub_hash"] == EMPTY_MD5
    # survivors are the doc minus the passage, order preserved
    exp1 = hashlib.md5(b"alpha beta gamma delta epsilon").hexdigest()
    assert out[1]["scrub_hash"] == exp1
    exp2 = hashlib.md5(b"one two three four five six seven").hexdigest()
    assert out[2]["scrub_hash"] == exp2


def test_intra_doc_repeat_counts_as_duplicated(spark):
    # the same 8-gram twice WITHIN one doc is duplicated text too
    eight = "a1 a2 a3 a4 a5 a6 a7 a8"
    docs = spark.createDataFrame(
        [(1, f"{eight} filler {eight}"), (2, "other words entirely")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dup_passage_stats(docs, k=8).collect()}
    assert out[1]["n_tokens"] == 17 and out[1]["dup_tokens"] == 16
    assert out[1]["scrub_hash"] == hashlib.md5(b"filler").hexdigest()
    assert out[2]["dup_tokens"] == 0
