"""cdc_engine.curate: the five-stage corpus-curation pipeline (PII scrub ->
exact dedup -> near dedup -> quality funnel -> splits). Every stage is an
independently oracle-checked operator; these tests pin the COMPOSITION
invariants — funnel monotonicity, survivor uniqueness, scrub completeness,
split tiling — and that the report numbers equal recomputed ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.curate import curate

# A doc body that passes every quality_funnel rule: 25..90 words, mean word
# length in [3,10], >=2 English stopwords, low punctuation, TTR > 0.2.
GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "while many other animals watch from their quiet homes near the old "
    "river bank under bright evening skies full of hope"
)


def _docs(spark):
    rows = [
        # identical twins -> exact dedup keeps doc 1
        (1, GOOD, "en"),
        (2, GOOD, "en"),
        # near-dup of GOOD (one word changed) -> near-dup stage folds into 1
        (3, GOOD.replace("quick", "swift"), "en"),
        # passes quality, carries PII to scrub
        (4, GOOD.replace("hope", "mail me at bob@example.com now or else"), "en"),
        # quality failures: too short
        (5, "tiny doc", "en"),
        # repetition (TTR) failure: stopwords present (passes r3) but only
        # 3 distinct tokens over 42 words -> TTR ~ 0.07 fails r5
        (6, " ".join(["the and spam"] * 14), "en"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_curate_funnel_and_survivors(spark):
    # threshold 0.9: doc 3 (one word changed, J ~ 0.95) folds into doc 1;
    # doc 4 (eight words changed, J ~ 0.8) survives as its own document
    curated, report = curate(_docs(spark), threshold_milli=900)
    try:
        # funnel is monotone
        assert (
            report["docs_in"]
            >= report["after_exact_dedup"]
            >= report["after_near_dedup"]
            >= report["after_quality"]
        )
        assert report["docs_in"] == 6
        assert report["after_exact_dedup"] == 5  # doc 2 dropped
        assert report["after_near_dedup"] == 4  # doc 3 folded into 1
        rows = {r["doc_id"]: r for r in curated.collect()}
        # doc 5 fails r1_len, doc 6 fails r5_ttr
        assert set(rows) == {1, 4}
        assert report["after_quality"] == 2
        assert report["funnel"]["pass"] == 2
        assert report["funnel"]["r1_len"] == 1
        assert report["funnel"]["r5_ttr"] == 1
        # PII scrubbed in the OUTPUT text, counted in the report
        assert "[EMAIL]" in rows[4]["text"] and "@" not in rows[4]["text"]
        assert report["pii_redactions"]["emails"] == 1
        # every output doc has a split and input columns survive
        assert all(r["split"] in ("train", "val", "test") for r in rows.values())
        assert rows[1]["lang"] == "en"
        assert sum(report["splits"].values()) == report["after_quality"]
    finally:
        curated.unpersist()


def test_curate_no_neardup_keeps_near_duplicates(spark, monkeypatch):
    # reporting rides the pipeline's own actions (Observations): a
    # loop-free curate() run is exactly its three materialization counts —
    # scrub+cache, exact-dedup, finalize — never an extra per-report-entry
    # collect/agg (Spark JOB counts are AQE-stage-dependent; ACTION count
    # is the deterministic invariant)
    # patch the CONCRETE class (pyspark.sql.DataFrame is the abstract
    # parent in Spark 4; curate's frames are classic.DataFrame instances)
    from pyspark.sql.classic.dataframe import DataFrame

    actions = {"count": 0, "collect": 0}
    orig_count, orig_collect = DataFrame.count, DataFrame.collect
    with monkeypatch.context() as m:
        m.setattr(DataFrame, "count", lambda self: (
            actions.__setitem__("count", actions["count"] + 1),
            orig_count(self))[1])
        m.setattr(DataFrame, "collect", lambda self: (
            actions.__setitem__("collect", actions["collect"] + 1),
            orig_collect(self))[1])
        curated, report = curate(_docs(spark), neardup=False)
    try:
        assert actions == {"count": 3, "collect": 0}, actions
        assert report["after_near_dedup"] == report["after_exact_dedup"] == 5
        ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
        assert 3 in ids  # the near-dup survives when the stage is off
    finally:
        curated.unpersist()


def test_curate_output_unique_and_no_cache_leak(spark):
    # delta, not absolute zero: other session-lifetime caches may exist
    # (e.g. contract._scored_pairs' intentional memo when the contract
    # suite ran first in this session) — the invariant is that curate()
    # itself leaks NOTHING
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    curated, report = curate(_docs(spark))
    try:
        # exact dedup guarantee: output texts are unique
        n = curated.count()
        assert curated.select("text").distinct().count() == n
        assert report["n_words_curated"] > 0
    finally:
        curated.unpersist()
    # only the returned frame was still cached; after unpersist no NET leak
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == before
