"""Table-level payload type widening (int->long through a live lake) and
the parquet metrics-table export."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import types as T

from cdc_engine import SnapLake, apply_epoch
from cdc_engine.textex import wrap_html


def _batch(spark, rows, fetch_type):
    schema = (
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        f"text string, lang string, fetch_status {fetch_type}, source_partition int"
    )
    return spark.createDataFrame(rows, schema)


def test_payload_widening_int_to_long(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1)
    schema_v = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("fetch_status", T.IntegerType(), True),
        ]
    )
    lake = SnapLake.create(str(tmp_path / "lake"), schema_v, n_buckets=4)
    apply_epoch(
        spark, lake,
        _batch(spark, [(0, "insert", "https://a/1", ts, wrap_html("a"), "a", "en", 200, 0)], "int"),
        epoch_id=0,
    )
    assert dict(lake.scan(spark).dtypes)["fetch_status"] == "int"
    # v2 of the producer widens fetch_status to long mid-stream
    apply_epoch(
        spark, lake,
        _batch(
            spark,
            [(1, "insert", "https://a/2", ts, wrap_html("b"), "b", "en", 5_000_000_000, 0)],
            "long",
        ),
        epoch_id=1,
    )
    got = lake.scan(spark)
    assert dict(got.dtypes)["fetch_status"] == "bigint"
    vals = {r["url"]: r["fetch_status"] for r in got.collect()}
    # the OLD parquet file (int32) reads correctly under the widened schema
    assert vals == {"https://a/1": 200, "https://a/2": 5_000_000_000}


def test_export_metrics(spark, wal_basic, tmp_path):
    from cdc_engine import CdcConfig, replay
    from cdc_engine.schemas import PAGES_SCHEMA_V1

    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    out = str(tmp_path / "metrics")
    lake.export_metrics(spark, out)
    ledger = spark.read.parquet(os.path.join(out, "ledger"))
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert ledger.count() == 4
    assert lineage.select("epoch_id").distinct().count() == 4
    assert {f.name for f in lineage.schema.fields} >= {
        "epoch_id", "partition_id", "first_seq", "last_seq", "snapshot_id",
        "rows_in", "rows_upserted", "rows_deleted", "bytes", "apply_latency_ms",
    }
