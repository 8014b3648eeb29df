"""delta_lsh_candidates: the incremental (per-epoch) near-dup candidate
set must equal the full-corpus recompute restricted to pairs touching the
new batch — the invariant that makes index-maintenance dedup safe to run
epoch-by-epoch instead of re-scoring the corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_engine.dedup_text import banded_signatures, delta_lsh_candidates, lsh_candidate_pairs
from cdc_engine.sampling import permille_bucket

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_delta_equals_full_chain_filtered(spark):
    docs = _docs(spark)
    b = permille_bucket(F.col("doc_id"), "epoch:")
    old, new = docs.where(b < 800), docs.where(b >= 800)

    got = {(r.da, r.db) for r in delta_lsh_candidates(old, new).collect()}

    is_new = lambda c: permille_bucket(F.col(c), "epoch:") >= 800
    full = {
        ((r.da, r.db), bool(r.touches_new))
        for r in lsh_candidate_pairs(docs)
        .select("da", "db", (is_new("da") | is_new("db")).alias("touches_new"))
        .collect()
    }
    want = {p for p, tn in full if tn}
    old_only = {p for p, tn in full if not tn}
    assert got == want and got, (len(got), len(want))
    # old×old pairs must be absent — the entire point of the delta form
    assert not (got & old_only)


def test_index_is_append_only(spark):
    """banded_signatures of a subset equals the full relation filtered to
    that subset: a doc's band keys don't depend on the rest of the corpus,
    so the production index table can APPEND each epoch's rows and never
    recompute old docs."""
    docs = _docs(spark)
    b = permille_bucket(F.col("doc_id"), "epoch:")
    new = docs.where(b >= 800)
    sub = {
        (r.doc_id, r.band, r.band_key) for r in banded_signatures(new).collect()
    }
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    full = {
        (r.doc_id, r.band, r.band_key)
        for r in banded_signatures(docs).collect()
        if r.doc_id in new_ids
    }
    assert sub == full and sub


def test_quality_survivor_policy(spark):
    """Longest member wins; ties break to the smallest doc_id; every
    component has exactly one survivor."""
    from cdc_engine.dedup_text import quality_survivors

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node long, component long",
    )
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (10, 50), (11, 50)],
        "doc_id long, n_chars long",
    )
    rows = {r.node: r.is_survivor for r in quality_survivors(labels, docs).collect()}
    assert rows == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_epoch_accumulation_telescopes(spark):
    """Three successive ingest epochs maintaining a signature INDEX:
    epoch-0 self candidates + each epoch's delta candidates must tile the
    full-corpus candidate set exactly — the invariant that lets a CDC
    pipeline dedup per epoch forever without ever re-scoring old×old."""
    from cdc_engine.dedup_text import lsh_candidate_pairs as full_pairs

    docs = _docs(spark)
    b = permille_bucket(F.col("doc_id"), "epoch:")
    epochs = [
        docs.where(b < 600),
        docs.where((b >= 600) & (b < 800)),
        docs.where(b >= 800),
    ]
    acc = {(r.da, r.db) for r in full_pairs(epochs[0]).collect()}
    index = banded_signatures(epochs[0])  # the persisted lake relation
    for ep in epochs[1:]:
        delta = delta_lsh_candidates(None, ep, old_banded=index)
        acc |= {(r.da, r.db) for r in delta.collect()}
        index = index.unionByName(banded_signatures(ep))  # epoch APPEND
    want = {(r.da, r.db) for r in full_pairs(docs).collect()}
    assert acc == want and acc


def test_overlapping_index_emits_no_self_pairs(spark):
    """ADVICE r5: if the maintained index already contains the new batch
    (an epoch appended twice through the unprotected old_banded API), the
    new x old join must not emit self-pairs (da == db) — the pair set
    stays exactly what lsh_candidate_pairs could produce."""
    docs = _docs(spark)
    b = permille_bucket(F.col("doc_id"), "epoch:")
    old, new = docs.where(b < 800), docs.where(b >= 800)
    # index wrongly holds old AND the new epoch already
    index = banded_signatures(docs)
    got = {(r.da, r.db) for r in
           delta_lsh_candidates(None, new, old_banded=index).collect()}
    assert got and all(da != db for da, db in got)
    # and it still equals the clean delta set
    want = {(r.da, r.db) for r in delta_lsh_candidates(old, new).collect()}
    assert got == want
