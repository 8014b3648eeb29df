"""Quality-funnel and unigram-LM scoring semantics (textops.quality_funnel,
textops.unigram_logprob)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.textops import quality_funnel, unigram_logprob


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_funnel_passed_iff_all_rules(spark):
    out = quality_funnel(_docs(spark))
    bad = out.where(
        (F.col("passed") == 1)
        != (
            (F.col("r1_len") == 1)
            & (F.col("r2_wordlen") == 1)
            & (F.col("r3_stop") == 1)
            & (F.col("r4_punct") == 1)
            & (F.col("r5_ttr") == 1)
        )
    ).count()
    assert bad == 0
    # first_fail = 'pass' exactly when passed
    assert out.where((F.col("first_fail") == "pass") != (F.col("passed") == 1)).count() == 0


def test_funnel_first_fail_is_first(spark):
    """first_fail names the EARLIEST failing rule: every rule before it
    must have passed."""
    out = quality_funnel(_docs(spark))
    assert out.where((F.col("first_fail") == "r3_stop") & (F.col("r1_len") == 0)).count() == 0
    assert out.where((F.col("first_fail") == "r5_ttr") & (F.col("r4_punct") == 0)).count() == 0
    # synthetic corpus exercises pass AND at least two distinct fail stages
    stages = {r["first_fail"] for r in out.select("first_fail").distinct().collect()}
    assert "pass" in stages and len(stages) >= 3


def test_funnel_short_doc_fails_r1(spark):
    docs = _docs(spark).limit(0).unionByName(
        _docs(spark)
        .sparkSession.createDataFrame(
            [(7, "tiny text", "en", "synth", 9)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    row = quality_funnel(docs).collect()[0]
    assert row["first_fail"] == "r1_len" and row["passed"] == 0


def test_unigram_common_beats_rare(spark):
    """A doc made of the corpus' most common tokens must score a LOWER
    per-token cross-entropy than one made of unique gibberish."""
    docs = _docs(spark)
    tok = docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w"))
    top = [
        r["w"]
        for r in tok.where("w <> ''")
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    ]
    extra = docs.sparkSession.createDataFrame(
        [
            (100001, " ".join(top * 4), "en", "synth", 0),
            (100002, "zqxj1 wvkp2 yfhg3 qjzx4 xvwq5 pqgh6", "en", "synth", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = unigram_logprob(docs.unionByName(extra))
    got = {r["doc_id"]: r for r in out.where(F.col("doc_id") > 100000).collect()}
    assert got[100001]["avg_lp_milli"] < got[100002]["avg_lp_milli"]


def test_unigram_totals_consistent(spark):
    """n_tokens matches an independent token count and the mean is the
    quotient of the total (exact integer bookkeeping)."""
    docs = _docs(spark)
    out = unigram_logprob(docs)
    n = docs.select(
        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    tot = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert tot == n
    bad = out.where(
        F.round(F.col("lp_total_milli") / F.col("n_tokens")).cast("long") != F.col("avg_lp_milli")
    ).count()
    assert bad == 0
