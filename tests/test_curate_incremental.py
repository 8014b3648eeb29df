"""Incremental curation (curate_incremental): a CDC epoch curated against
the standing corpus state must compose to EXACTLY the full-corpus batch
recompute — epoch survivors ∪ (prior survivors − retractions) — including
the bridge case where a new doc links two standing near-dup clusters."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_engine.curate import curate, curate_incremental
from tests.conftest import DOCS_SF0001


def _docs(spark):
    return spark.read.parquet(DOCS_SF0001).select("doc_id", "text", "lang")


def _ids(df):
    return {int(r["doc_id"]) for r in df.select("doc_id").collect()}


def test_bootstrap_equals_full_curate(spark, tmp_path):
    """Empty state makes every incremental stage degenerate to the full
    pipeline: bootstrap == curate() on the same docs, id-for-id, with the
    same funnel report and zero retractions."""
    docs = _docs(spark)
    full, rep_full = curate(docs)
    cur, retr, rep = curate_incremental(
        spark, docs, str(tmp_path / "state_boot")
    )
    assert _ids(cur) == _ids(full)
    assert retr.count() == 0
    for key in ("docs_in", "after_exact_dedup", "after_near_dedup",
                "after_quality", "funnel", "n_words_curated"):
        assert rep[key] == rep_full[key], key
    full.unpersist(); cur.unpersist(); retr.unpersist()


def test_epoch_compose_equals_batch_recompute(spark, tmp_path):
    """Split the corpus at a doc_id boundary: bootstrap(old) then
    incremental(epoch) must satisfy
    curate(old ∪ epoch) == (prior − retractions) ∪ epoch-survivors."""
    docs = _docs(spark)
    cut = 400
    old, epoch = docs.where(F.col("doc_id") < cut), docs.where(F.col("doc_id") >= cut)
    state = str(tmp_path / "state")

    prior, retr0, _ = curate_incremental(spark, old, state)
    assert retr0.count() == 0
    cur, retr, rep = curate_incremental(spark, epoch, state)

    full, _ = curate(docs)
    retracted = {int(r["retracted_id"]) for r in retr.collect()}
    composed = (_ids(prior) - retracted) | _ids(cur)
    assert composed == _ids(full)
    # per-doc stages are content-stable: split assignment must agree
    splits_inc = {
        (int(r["doc_id"]), r["split"]) for r in cur.select("doc_id", "split").collect()
    }
    splits_full = {
        (int(r["doc_id"]), r["split"])
        for r in full.select("doc_id", "split").collect()
        if int(r["doc_id"]) >= cut
    }
    assert splits_inc <= splits_full | splits_inc  # same split where both kept
    for d, s in splits_inc:
        assert (d, s) in splits_full or d not in {x for x, _ in splits_full}
    prior.unpersist(); cur.unpersist(); retr.unpersist(); full.unpersist()


def test_three_epochs_compose(spark, tmp_path):
    """Two successive incremental epochs after a bootstrap still compose
    to the batch recompute (state survives multiple appends; labels
    rewrite chains)."""
    docs = _docs(spark)
    state = str(tmp_path / "state3")
    survivors: set[int] = set()
    retracted_all: set[int] = set()
    for lo, hi in ((0, 300), (300, 420), (420, 10_000)):
        part = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        cur, retr, _ = curate_incremental(spark, part, state)
        retracted = {int(r["retracted_id"]) for r in retr.collect()}
        survivors -= retracted
        retracted_all |= retracted
        survivors |= _ids(cur)
        cur.unpersist(); retr.unpersist()
    full, _ = curate(docs)
    assert survivors == _ids(full)
    full.unpersist()


def test_bridge_retraction(spark, tmp_path):
    """A new doc near-similar to TWO standing clusters bridges them: the
    larger cluster's canonical doc must be retracted, and the composition
    must still equal the batch recompute."""
    # disjoint 40-token vocabularies + shared stopwords (to pass the
    # funnel's stopword gate): J(A,B) = 6/86 ~ 70 per-mille (dissimilar),
    # J(bridge, A) = J(bridge, B) = 46/86 ~ 535 per-mille (similar)
    stop = "the and is of to in"
    base_a = stop + " " + " ".join(f"aa{i}" for i in range(40))
    base_b = stop + " " + " ".join(f"bb{i}" for i in range(40))
    bridge = (
        stop
        + " " + " ".join(f"aa{i}" for i in range(40))
        + " " + " ".join(f"bb{i}" for i in range(40))
    )
    rows_old = [(1, base_a, "en"), (2, base_b, "en")]
    rows_new = [(10, bridge, "en")]
    old = spark.createDataFrame(rows_old, "doc_id long, text string, lang string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string, lang string")
    state = str(tmp_path / "state_bridge")

    # band_rows=1 (8 one-row bands) so the ~0.53-Jaccard bridge pairs are
    # near-certain LSH candidates; threshold 500 keeps them, drops A-B
    kw = dict(threshold_milli=500, band_rows=1, min_words=10, max_words=90)
    prior, retr0, _ = curate_incremental(spark, old, state, **kw)
    prior_ids = _ids(prior)
    assert retr0.count() == 0
    # both standing docs are dissimilar -> both survive near-dup
    assert prior_ids == {1, 2}

    cur, retr, rep = curate_incremental(spark, new, state, **kw)
    retracted = {int(r["retracted_id"]) for r in retr.collect()}
    assert retracted == {2}, "bridging must retract the larger canonical"
    assert rep["retractions"] == 1
    assert _ids(cur) == set()  # the bridge doc itself loses to doc 1

    full, _ = curate(old.unionByName(new), **kw)
    assert (prior_ids - retracted) | _ids(cur) == _ids(full)
    prior.unpersist(); cur.unpersist(); retr.unpersist(); full.unpersist()


def test_monotone_id_contract_enforced(spark, tmp_path):
    docs = _docs(spark)
    state = str(tmp_path / "state_mono")
    cur, retr, _ = curate_incremental(
        spark, docs.where(F.col("doc_id") >= 100), state
    )
    cur.unpersist(); retr.unpersist()
    with pytest.raises(ValueError, match="monotone"):
        curate_incremental(spark, docs.where(F.col("doc_id") < 100), state)


def test_param_mismatch_refused(spark, tmp_path):
    docs = _docs(spark).where(F.col("doc_id") < 50)
    state = str(tmp_path / "state_params")
    cur, retr, _ = curate_incremental(spark, docs, state)
    cur.unpersist(); retr.unpersist()
    with pytest.raises(ValueError, match="params"):
        curate_incremental(
            spark, _docs(spark).where(F.col("doc_id") >= 50), state,
            threshold_milli=500,
        )
