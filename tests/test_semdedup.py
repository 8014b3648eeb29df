"""SemDeDup screen semantics (simsearch.semdedup): within-cluster cosine
screen drops exactly the higher-id member of every near-duplicate pair,
never the cluster's lowest-id member, and is invariant to partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.simsearch import semdedup


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_exact_duplicate_vector_is_dropped(spark):
    """Planting a bit-identical copy of vector 0 under a fresh high id must
    mark the copy dropped (cos == 1.0 >= any tau < 1) and leave the
    original's dropped flag unchanged."""
    emb = _emb(spark)
    orig = emb.where(F.col("vec_id") == 0)
    clone = orig.withColumn("vec_id", F.lit(999_999).cast(orig.schema["vec_id"].dataType))
    out = semdedup(emb.unionByName(clone), n_cells=16, tau_milli=900)
    got = {r["vec_id"]: r for r in out.where(F.col("vec_id").isin(0, 999_999)).collect()}
    assert got[999_999]["dropped"] == 1
    assert got[999_999]["n_near"] >= 1
    # same cell as the original (identical vector -> identical assignment)
    assert got[999_999]["cell"] == got[0]["cell"]


def test_lowest_id_cell_member_never_dropped(spark):
    """The screen only compares against LOWER-id in-cell members, so each
    cell's minimum vec_id has nothing to match and must survive."""
    out = semdedup(_emb(spark), n_cells=16, tau_milli=900)
    w = out.groupBy("cell").agg(F.min("vec_id").alias("lo"))
    bad = (
        out.join(w, (out.vec_id == w.lo) & (out.cell == w.cell))
        .where(F.col("dropped") != 0)
        .count()
    )
    assert bad == 0


def test_tau_monotone_and_partition_invariant(spark):
    """Raising tau can only shrink the dropped set; results are a pure
    function of the data (invariant to repartitioning)."""
    emb = _emb(spark)
    lo = semdedup(emb, n_cells=16, tau_milli=700)
    hi = semdedup(emb, n_cells=16, tau_milli=950)
    d_lo = {r["vec_id"] for r in lo.where("dropped = 1").collect()}
    d_hi = {r["vec_id"] for r in hi.where("dropped = 1").collect()}
    assert d_hi <= d_lo
    again = semdedup(emb.repartition(17), n_cells=16, tau_milli=700)
    assert sorted(lo.collect()) == sorted(again.collect())
