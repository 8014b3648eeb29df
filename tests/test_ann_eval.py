"""simsearch.ann_recall_at_k (IVF recall vs brute truth) and
dedup_text.minhash_jaccard_est (signature-agreement Jaccard estimate):
the eval + estimate layers over the ANN/LSH operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def test_recall_is_perfect_when_index_is_exhaustive(spark):
    """n_cells=1: every vector lands in the single cell, so the IVF
    re-rank IS the brute scan — recall must be exactly 1000 everywhere."""
    from cdc_engine.simsearch import ann_recall_at_k

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ann_recall_at_k(emb, n_cells=1, k=10, n_queries=8).collect()
    assert len(out) == 8
    assert all(r["n_overlap"] == 10 and r["recall_milli"] == 1000 for r in out)


def test_recall_bounded_and_panel_complete(spark):
    from cdc_engine.simsearch import ann_recall_at_k

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ann_recall_at_k(emb, n_cells=16, k=10, n_queries=20).collect()
    assert sorted(r["qid"] for r in out) == list(range(16, 36))
    for r in out:
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_milli"] == (1000 * r["n_overlap"]) // 10


def test_est_is_exact_on_identical_docs(spark):
    """Identical texts share every minhash component: the LSH pairs them
    and the estimate must be exactly 1000."""
    from cdc_engine.dedup_text import minhash_jaccard_est

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps", "en"),
         (2, "the quick brown fox jumps", "en"),
         (3, "completely different words here altogether", "en")],
        "doc_id long, text string, lang string",
    )
    rows = {(r["da"], r["db"]): r for r in minhash_jaccard_est(docs).collect()}
    assert rows[(1, 2)]["n_match"] == 8
    assert rows[(1, 2)]["est_milli"] == 1000


def test_est_pairs_equal_lsh_candidates(spark):
    """The estimate covers exactly the LSH candidate set (no pair gained
    or lost by the vector join), and every estimate is in [0, 1000]."""
    from cdc_engine.dedup_text import lsh_candidate_pairs, minhash_jaccard_est

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    est = minhash_jaccard_est(docs, k=8, band_rows=2)
    got = {(r["da"], r["db"]) for r in est.collect()}
    want = {(r["da"], r["db"]) for r in lsh_candidate_pairs(docs).collect()}
    assert got == want and got
    # any candidate shares >=1 full band (band_rows components) by
    # construction -> n_match >= band_rows
    assert est.where((F.col("n_match") < 2) | (F.col("est_milli") > 1000)).count() == 0
