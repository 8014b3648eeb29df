"""Deterministic sampling: split assignment must be a pure function of the
key — invariant to partitioning, row order, and re-computation — and hit
the configured proportions in expectation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.sampling import dataset_splits, stratified_sample


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_split_assignment_invariant_to_partitioning(spark):
    docs = _docs(spark)
    a = sorted(dataset_splits(docs).collect())
    b = sorted(dataset_splits(docs.repartition(13).orderBy(F.rand(3))).collect())
    assert a == b


def test_split_proportions_and_exclusivity(spark):
    got = dataset_splits(_docs(spark)).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in got}
    n = sum(by.values())
    assert set(by) <= {"train", "val", "test"}
    # 80/10/10 within generous binomial slack at n=500
    assert 0.70 * n <= by["train"] <= 0.90 * n
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0


def test_stratified_rates_respected(spark):
    docs = _docs(spark)
    kept = stratified_sample(docs, {"fr": 1000, "en": 0}, default_permille=0)
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"fr"}  # en rate 0, default 0 -> only fr survives
    n_fr = docs.where(F.col("lang") == "fr").count()
    assert kept.count() == n_fr  # rate 1000 == keep all


def test_stratified_sample_is_subset_and_stable(spark):
    docs = _docs(spark)
    s1 = {r["doc_id"] for r in stratified_sample(docs, {"en": 300}).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in stratified_sample(docs.repartition(7), {"en": 300}).select("doc_id").collect()}
    assert s1 == s2
    # growing the rate only ADDS members (nested samples — the property that
    # lets you scale a corpus mix up without resampling everything)
    s3 = {r["doc_id"] for r in stratified_sample(docs, {"en": 600}).select("doc_id").collect()}
    assert s1 <= s3


# ---------------------------------------------------------------------------
# pack_sequences — concat-and-chunk sequence packing (two-pass prefix sum)
# ---------------------------------------------------------------------------

def test_pack_sequences_invariant_to_range_width(spark):
    """The range decomposition is an implementation detail: any range_width
    (including 1 = per-key ranges and huge = one range, i.e. the naive
    global cumsum) must yield identical bins."""
    from cdc_engine.sampling import pack_sequences

    docs = _docs(spark)
    base = sorted(pack_sequences(docs, capacity=256, range_width=128).collect())
    for rw in (1, 7, 10_000_000):
        got = sorted(pack_sequences(docs, capacity=256, range_width=rw).collect())
        assert got == base, f"range_width={rw} diverged"


def test_pack_sequences_conservation_and_contiguity(spark):
    """Bins partition the corpus: doc counts and token counts sum to the
    corpus totals, bin_ids are the contiguous prefix 0..max, and every
    bin except possibly the last starts a new doc below its capacity
    ceiling (start offsets are monotone in doc_id)."""
    from cdc_engine.sampling import pack_sequences

    docs = _docs(spark)
    bins = sorted(
        pack_sequences(docs, capacity=256).collect(), key=lambda r: r["bin_id"]
    )
    n_docs = docs.count()
    n_tok = docs.select(
        F.sum(
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit("")))
        ).alias("s")
    ).collect()[0]["s"]
    assert sum(r["n_docs"] for r in bins) == n_docs
    assert sum(r["n_tokens"] for r in bins) == n_tok
    assert [r["bin_id"] for r in bins] == list(range(len(bins)))
    # doc-id ranges of consecutive bins are disjoint and increasing
    for a, b in zip(bins, bins[1:]):
        assert a["last_doc"] < b["first_doc"]


# ---------------------------------------------------------------------------
# mixture_weights / stratified_topn
# ---------------------------------------------------------------------------

def test_mixture_weights_temperature_flattens(spark):
    """tau=2 weights must sit between the raw share and uniform: strictly
    above share for below-average strata, below for dominant ones — and
    both milli columns must sum to ~1000 (floor slack < n_strata)."""
    from cdc_engine.sampling import mixture_weights

    rows = mixture_weights(_docs(spark), stratum="source").collect()
    n = len(rows)
    assert sum(r["share_milli"] for r in rows) > 1000 - n
    assert sum(r["weight_milli"] for r in rows) > 1000 - n
    mean_share = 1000 / n
    for r in rows:
        if r["share_milli"] < mean_share - 1:
            assert r["weight_milli"] >= r["share_milli"], r
        if r["share_milli"] > mean_share + 1:
            assert r["weight_milli"] <= r["share_milli"], r


def test_stratified_topn_deterministic_and_exact(spark):
    from cdc_engine.sampling import stratified_topn

    docs = _docs(spark)
    a = sorted(stratified_topn(docs, n=10).collect())
    b = sorted(stratified_topn(docs.repartition(17).orderBy(F.rand(7)), n=10).collect())
    assert a == b  # membership is a pure function of the key
    by = {}
    for r in a:
        by.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in by.items():
        n_src = docs.where(F.col("source") == src).count()
        assert sorted(ranks) == list(range(1, min(10, n_src) + 1)), src
