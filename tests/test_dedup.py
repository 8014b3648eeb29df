"""W1 unit tests: LWW survivor selection, permutation invariance,
strategy equivalence (maxby == window == salted)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_engine.dedup import lww_dedup


def _events(spark):
    ts = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # url, warc_ts, seq, payload
        ("a", ts(5), 1, "a-v1"),
        ("a", ts(9), 2, "a-v2"),   # winner: newest ts
        ("a", ts(7), 3, "a-v3"),   # out-of-order: newer seq, older ts -> loses
        ("b", ts(4), 4, "b-v1"),
        ("b", ts(4), 5, "b-v1"),   # duplicate delivery: same ts, higher seq wins
        ("c", ts(1), 6, "c-v1"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, seq long, text string")


def test_survivors(spark):
    got = {
        r["url"]: (r["seq"], r["text"])
        for r in lww_dedup(_events(spark), seq="seq").collect()
    }
    assert got == {"a": (2, "a-v2"), "b": (5, "b-v1"), "c": (6, "c-v1")}


@pytest.mark.parametrize("strategy,salt", [("maxby", 0), ("maxby", 4), ("window", 0)])
def test_strategies_agree_and_permutation_invariant(spark, strategy, salt):
    df = _events(spark)
    base = sorted(lww_dedup(df, strategy="maxby").collect())
    kb = sorted(lww_dedup(df.orderBy(F.rand(9)), strategy="keybroadcast").collect())
    assert kb == base
    got = sorted(lww_dedup(df.orderBy(F.rand(7)), strategy=strategy, salt_buckets=salt).collect())
    assert got == base


def test_schema_preserved(spark):
    df = _events(spark)
    assert lww_dedup(df).columns == df.columns
