"""Count-Min Sketch invariants (sketch.cms_counters / cms_heavy_hitters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.sketch import cms_counters, cms_heavy_hitters


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_cms_one_sided_guarantee_every_key(spark):
    """est >= exact for EVERY key, not just the reported top-k (the CMS
    one-sided error bound)."""
    ev = _events(spark)
    n_keys = ev.select("user_id").distinct().count()
    out = cms_heavy_hitters(ev, "user_id", d=4, w=64, k=n_keys)
    assert out.count() == n_keys
    assert out.where(F.col("overcount") < 0).count() == 0


def test_cms_counters_bounded_and_total(spark):
    """At most d*w cells, and each row of the matrix sums to the event
    count (every event lands in exactly one cell per row)."""
    ev = _events(spark)
    total = ev.count()
    c = cms_counters(ev, "user_id", d=4, w=64)
    assert c.count() <= 4 * 64
    sums = {r["j"]: r["s"] for r in c.groupBy("j").agg(F.sum("n").alias("s")).collect()}
    assert set(sums) == {0, 1, 2, 3} and all(v == total for v in sums.values())


def test_cms_mergeable(spark):
    """Counters are cell-wise additive across splits — the property that
    makes the sketch distributable and window-mergeable."""
    ev = _events(spark)
    a = ev.where("event_id % 2 = 0")
    b = ev.where("event_id % 2 = 1")
    whole = {(r["j"], r["col"]): r["n"] for r in cms_counters(ev, "user_id").collect()}
    ca = {(r["j"], r["col"]): r["n"] for r in cms_counters(a, "user_id").collect()}
    cb = {(r["j"], r["col"]): r["n"] for r in cms_counters(b, "user_id").collect()}
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == whole
