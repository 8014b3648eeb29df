"""Watermarked streaming metrics (T2/T4) and transport-dedup (T3) over the
file-WAL stream, drained with availableNow into a memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.source import open_stream
from cdc_engine.streaming_metrics import drop_exact_redeliveries, windowed_metrics


def _drain(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_metrics_cover_stream(spark, wal_basic):
    wal_dir, wcfg, _ = wal_basic
    stream = open_stream(spark, wal_dir, max_files_per_trigger=2)
    # complete mode: every window visible (append would emit only windows
    # the watermark has closed; the watermark still bounds state)
    _drain(windowed_metrics(stream, window="1 hour", watermark="2 hours"), "win_metrics", "complete")
    got = spark.table("win_metrics").toPandas()
    assert got["n"].sum() == wcfg.n_events
    assert set(got["op"]) == {"insert", "update", "delete"}
    assert (got["window_end"] - got["window_start"]).nunique() == 1
    # seq ranges inside a window are sane
    assert (got["first_seq"] <= got["last_seq"]).all()


def test_drop_exact_redeliveries(spark, wal_basic):
    wal_dir, wcfg, _ = wal_basic
    stream = open_stream(spark, wal_dir, max_files_per_trigger=2)
    # duplicate every event at the transport level (same seq re-delivered)
    doubled = stream.unionByName(stream)
    # fixture's out-of-order skew is <=100s, so a 200s watermark is safe;
    # rows newer than (max_ts - watermark) stay buffered in state when an
    # availableNow drain ends — only the emitted prefix is checkable
    deduped = drop_exact_redeliveries(doubled, watermark="200 seconds").select("seq")
    _drain(deduped, "transport_dedup", "append")
    got = spark.table("transport_dedup")
    n = got.count()
    assert got.distinct().count() == n  # every emitted offset exactly once
    # all but the trailing ~200s of event time must have been emitted
    assert wcfg.n_events - 500 <= n <= wcfg.n_events
