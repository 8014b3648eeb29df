"""Reciprocal-rank fusion semantics (retrieval.rrf_fuse)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.retrieval import rrf_fuse
from cdc_engine.simsearch import brute_topk
from cdc_engine.textops import bm25_topk

TERMS = ["hash", "join", "stream", "vector", "window"]


def _lists(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return bm25_topk(docs, terms=TERMS, k=20), brute_topk(emb, 0, k=20)


def test_rrf_matches_hand_computation(spark):
    """rrf_ppm must equal the integer 1e6//(60+rank) sum recomputed in
    plain Python from the two ranked lists."""
    lex, sem = _lists(spark)
    lex_rows = lex.collect()  # already ordered (score desc, doc_id)
    sem_rows = sem.collect()
    lrank = {r["doc_id"]: i + 1 for i, r in enumerate(lex_rows)}
    srank = {r["vec_id"]: i + 1 for i, r in enumerate(sem_rows)}
    expect = {
        d: (1_000_000 // (60 + lrank[d]) if d in lrank else 0)
        + (1_000_000 // (60 + srank[d]) if d in srank else 0)
        for d in set(lrank) | set(srank)
    }
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["doc_id"], r["rrf_ppm"]) for r in rrf_fuse(lex, sem, k=10).collect()]
    assert got == top


def test_rrf_absent_side_reports_rank_zero(spark):
    lex, sem = _lists(spark)
    out = rrf_fuse(lex, sem, k=10).collect()
    lex_ids = {r["doc_id"] for r in lex.collect()}
    sem_ids = {r["vec_id"] for r in sem.collect()}
    for r in out:
        assert (r["lex_rank"] == 0) == (r["doc_id"] not in lex_ids)
        assert (r["sem_rank"] == 0) == (r["doc_id"] not in sem_ids)
        assert r["rrf_ppm"] > 0


def test_rrf_both_lists_beats_single_at_same_rank(spark):
    """Synthetic check of the fusion property: rank r in BOTH lists always
    outscores rank r in one list alone."""
    lex = spark.createDataFrame(
        [(1, 900), (2, 800)], "doc_id long, score_milli long"
    )
    sem = spark.createDataFrame(
        [(1, 700), (3, 600)], "vec_id long, dot_q long"
    )
    got = {r["doc_id"]: r["rrf_ppm"] for r in rrf_fuse(lex, sem, k=10).collect()}
    assert got[1] > got[2] and got[1] > got[3]
    assert got[1] == 2 * (1_000_000 // 61)
