"""Winnowing fingerprint edge cases + a reference-implementation check
(sequential Python winnowing == the Catalyst array-expression form)."""

from __future__ import annotations

import hashlib
import re


from cdc_engine.textops import winnow_fingerprint

_TOK_RE = re.compile(r"[^a-z0-9]+")


def _ref_winnow(text: str, k: int = 5, w: int = 4):
    toks = [t for t in _TOK_RE.split(text.lower()) if t]
    if len(toks) < k:
        return 0, 0, hashlib.md5(b"").hexdigest()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hashes = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
    if len(hashes) < w:
        mins = []
    else:
        mins = [min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)]
    fps = sorted(set(mins))
    fp_hash = hashlib.md5(",".join(str(x) for x in fps).encode()).hexdigest()
    return len(hashes), len(fps), fp_hash


def test_winnow_matches_reference(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where("doc_id < 40")
        .select("doc_id", "text")
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_fps"], r["fp_hash"])
        for r in winnow_fingerprint(docs).collect()
    }
    want = {r["doc_id"]: _ref_winnow(r["text"]) for r in docs.collect()}
    assert got == want


def test_winnow_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four"),  # 4 tokens < k=5 -> no grams
            (2, "one two three four five"),  # exactly k tokens -> 1 gram < w
            (3, "a b c d e f g h"),  # 8 tokens -> 4 grams -> 1 window
            (4, ""),  # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_fps"]) for r in winnow_fingerprint(docs).collect()}
    assert got[1] == (0, 0)
    assert got[2] == (1, 0)  # fewer hashes than the window -> no fingerprints
    assert got[3] == (4, 1)
    assert got[4] == (0, 0)
    # shared content -> shared fingerprints (the property dedup relies on)
    long_a = "the quick brown fox jumps over the lazy dog again and again ok"
    docs2 = spark.createDataFrame(
        [(10, long_a), (11, long_a + " with a tiny suffix change")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fp_hash"] for r in winnow_fingerprint(docs2).collect()}
    assert rows[10] != rows[11]  # not identical...
    ref10, ref11 = _ref_winnow(long_a), _ref_winnow(long_a + " with a tiny suffix change")
    assert rows[10] == ref10[2] and rows[11] == ref11[2]
