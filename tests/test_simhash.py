"""The pure-Catalyst simhash_fingerprints must reproduce the per-row
reference implementation (the obvious sequential SimHash, kept here as the
executable oracle — it was the engine's round-1 pandas UDF body)."""

from __future__ import annotations

import hashlib
import re

import numpy as np

from cdc_engine.dedup_text import SIMHASH_BITS, simhash_fingerprints

_TOK_RE = re.compile(r"[^a-z0-9]+")


def _ref_simhash(t: str | None) -> int | None:
    if t is None:
        return None
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for w in set(filter(None, _TOK_RE.split(t.lower()))):
        h = int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
        bits = (h >> np.arange(SIMHASH_BITS)) & 1
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            out |= 1 << i
    return out


def test_simhash_matches_reference_on_fixtures(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where("doc_id < 80")
        .select("doc_id", "lang", "text")
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    want = {r["doc_id"]: _ref_simhash(r["text"]) for r in docs.collect()}
    assert got == want


def test_simhash_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "hello world hello"),
            (2, "en", ""),  # no tokens -> 0
            (3, "en", None),  # null text -> null
            (4, "en", "!!! ??? ..."),  # punctuation-only -> 0
            (5, "en", "Hello, WORLD"),  # same token set as doc 1 minus dup
        ],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert got[1] == _ref_simhash("hello world hello")
    assert got[2] == 0
    assert got[3] is None
    assert got[4] == 0
    # token SETS are equal ({hello, world}) so fingerprints are equal
    assert got[5] == got[1]
