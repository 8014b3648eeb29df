"""P3 unit tests: conform (null-fill, widen, reject narrowing), rename
mapping, evolve_schema merge rules, and table-level payload widening."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cdc_engine.normalize import apply_mapping, conform, evolve_schema, widest


def test_conform_adds_missing_and_widens(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    out = conform(df, target)
    assert out.dtypes == [("a", "bigint"), ("b", "string"), ("c", "double")]
    assert out.collect()[0] == (1, "x", None)


def test_conform_rejects_narrowing(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(TypeError, match="conform"):
        conform(df, T.StructType([T.StructField("a", T.IntegerType())]))


def test_apply_mapping(spark):
    df = spark.createDataFrame([(1, "u")], "page_url int, ts string")
    out = apply_mapping(df, {"page_url": "url", "ts": "warc_ts"})
    assert out.columns == ["url", "warc_ts"]


def test_evolve_schema_appends_and_widens():
    cur = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("b", T.StringType())]
    )
    inc = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("z", T.DoubleType())]
    )
    out = evolve_schema(cur, inc)
    assert [(f.name, f.dataType.typeName()) for f in out.fields] == [
        ("a", "long"), ("b", "string"), ("z", "double"),
    ]
    assert out["z"].nullable  # new columns always nullable


def test_evolve_schema_incompatible():
    cur = T.StructType([T.StructField("a", T.StringType())])
    inc = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(TypeError, match="incompatible"):
        evolve_schema(cur, inc)


def test_widest_symmetric():
    assert widest(T.IntegerType(), T.LongType()) == T.LongType()
    assert widest(T.LongType(), T.IntegerType()) == T.LongType()
    assert widest(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widest(T.DateType(), T.TimestampType()) == T.TimestampType()
