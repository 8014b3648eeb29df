"""corpus_shuffle permutation semantics and dup_ngram_share hand-checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.sampling import corpus_shuffle
from cdc_engine.textops import dup_ngram_share


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_shuffle_is_permutation_and_partition_invariant(spark):
    docs = _docs(spark)
    out = corpus_shuffle(docs, seed="s0")
    n = docs.count()
    pos = [r["pos"] for r in out.collect()]
    assert sorted(pos) == list(range(n))  # exact permutation, 0..N-1
    again = sorted(corpus_shuffle(docs.repartition(13), seed="s0").collect())
    assert sorted(out.collect()) == again


def test_shuffle_seed_changes_order_but_not_membership(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["pos"] for r in corpus_shuffle(docs, seed="s0").collect()}
    b = {r["doc_id"]: r["pos"] for r in corpus_shuffle(docs, seed="s1").collect()}
    assert set(a) == set(b)
    assert a != b  # a different seed is a different permutation


def test_dup_ngram_share_hand_check(spark):
    doc = spark.createDataFrame(
        [(1, "a b c a b c a b c", "en", "synth", 17),
         (2, "all distinct words here now", "en", "synth", 27),
         (3, "xy zz", "en", "synth", 5)],  # < 3 tokens -> 0 grams
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in dup_ngram_share(doc, n=3).collect()}
    # 9 tokens -> 7 grams, 3 distinct -> 4 surplus, round(4000/7) = 571
    assert (got[1]["n_grams"], got[1]["n_dup"], got[1]["dup_milli"]) == (7, 4, 571)
    assert (got[2]["n_grams"], got[2]["n_dup"], got[2]["dup_milli"]) == (3, 0, 0)
    assert got[3]["n_grams"] == 0 and got[3]["dup_milli"] is None
