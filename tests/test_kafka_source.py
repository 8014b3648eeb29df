"""Kafka value-parsing path (S1 cluster backend): pure Catalyst, so it is
fully testable on a static DataFrame shaped like Kafka's wire schema even
though the sandbox has no Kafka jars. Covers: JSON round-trip incl. binary
html via base64, v1 producers omitting v2 fields, seq/partition fallback to
Kafka offsets, tombstones, and malformed JSON degrading to a quarantinable
null-url row instead of an error."""

from __future__ import annotations

import base64
import json
from datetime import datetime

from pyspark.sql import types as T

from cdc_engine.schemas import WAL_SCHEMA_LATEST
from cdc_engine.source import parse_kafka_records

KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _rec(payload: dict | bytes, partition: int, offset: int):
    val = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    return (b"k", val, "pages-wal", partition, offset, datetime(2024, 1, 1))


def _wire(spark, rows):
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_kafka_parse_round_trip(spark):
    html = b"<html><body>hi</body></html>"
    ev = {
        "seq": 7,
        "op": "insert",
        "url": "https://d0001.example.com/p01",
        "warc_ts": "2024-01-02T03:04:05.000006",
        "html_b64": base64.b64encode(html).decode(),
        "text": "hi",
        "lang": "en",
        "source_partition": 3,
        "fetch_status": 200,
    }
    out = parse_kafka_records(_wire(spark, [_rec(ev, 0, 100)])).collect()[0]
    assert out["seq"] == 7 and out["op"] == "insert"
    assert bytes(out["html"]) == html
    assert out["warc_ts"] == datetime(2024, 1, 2, 3, 4, 5, 6)
    assert out["source_partition"] == 3 and out["fetch_status"] == 200


def test_kafka_parse_schema_matches_wal(spark):
    df = parse_kafka_records(_wire(spark, []))
    assert [f.name for f in df.schema.fields] == [
        f.name for f in WAL_SCHEMA_LATEST.fields
    ]
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in WAL_SCHEMA_LATEST.fields
    ]


def test_kafka_parse_v1_producer_and_offset_fallback(spark):
    # an old producer: no seq, no source_partition, no fetch_status
    ev = {
        "op": "update",
        "url": "https://d0002.example.com/p02",
        "warc_ts": "2024-01-02T00:00:00",
        "html_b64": base64.b64encode(b"x").decode(),
        "text": "x",
        "lang": "en",
    }
    out = parse_kafka_records(_wire(spark, [_rec(ev, 5, 4242)])).collect()[0]
    assert out["seq"] == 4242  # Kafka offset fallback
    assert out["source_partition"] == 5  # topic-partition fallback
    assert out["fetch_status"] is None  # v2 column widens to NULL


def test_kafka_parse_tombstone_and_garbage(spark):
    tomb = {
        "seq": 9,
        "op": "delete",
        "url": "https://d0003.example.com/p03",
        "warc_ts": "2024-01-03T00:00:00",
        "html_b64": None,
        "text": None,
        "lang": None,
    }
    rows = parse_kafka_records(
        _wire(spark, [_rec(tomb, 1, 9), _rec(b"{not json", 1, 10)])
    ).orderBy("seq").collect()
    assert rows[0]["op"] == "delete" and rows[0]["html"] is None
    # malformed JSON -> null struct -> null url (quarantined by P4), with
    # seq still usable from the Kafka offset
    assert rows[1]["url"] is None and rows[1]["seq"] == 10
