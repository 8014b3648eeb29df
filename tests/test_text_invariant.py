"""The binding per-row invariant (BASELINE.json:15): extract_text(html) is
byte-identical to the stored text column, verified through the vectorized
pandas/Arrow UDF over the whole final table."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.textex import extract_text, text_invariant_violations, wrap_html


def test_wrap_roundtrip_unicode(spark):
    texts = ["plain", "üñíçødé ✓ 中文", "", "v1 <body> trick"]
    df = spark.createDataFrame(
        [(t, wrap_html(t)) for t in texts], "text string, html binary"
    )
    got = df.select(extract_text("html").alias("e"), "text").collect()
    for r in got:
        assert r["e"] == r["text"]


def test_invariant_holds_on_final_table(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    final = lake.scan(spark)
    assert final.count() > 0
    assert text_invariant_violations(final).isEmpty()


def test_violation_detected(spark):
    df = spark.createDataFrame(
        [("ok", wrap_html("ok")), ("tampered", wrap_html("original"))],
        "text string, html binary",
    )
    bad = text_invariant_violations(df).collect()
    assert [r["text"] for r in bad] == ["tampered"]
