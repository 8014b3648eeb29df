"""applyInPandasWithState LWW gate (T7 optional surface): per-url state
survives ACROSS micro-batches — a stale re-delivery in a later batch is
suppressed by state written in an earlier one, and the union of emitted
rows equals the LWW winners the batch dedup would produce."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cdc_engine.source import open_stream
from cdc_engine.streaming_state import lww_gate
from cdc_engine.schemas import WAL_SCHEMA_V1


def _write_segment(d: str, first_seq: int, rows: list[dict]) -> None:
    os.makedirs(os.path.join(d, "v1"), exist_ok=True)
    pdf = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source_partition", pa.int32()),
        ]
    )
    tbl = pa.Table.from_pandas(pdf[[f.name for f in schema]], schema=schema, preserve_index=False)
    pq.write_table(tbl, os.path.join(d, "v1", f"segment-{first_seq:012d}.parquet"))


def _row(seq, url, ts_s, text):
    return {
        "seq": seq,
        "op": "upsert",
        "url": url,
        "warc_ts": dt.datetime(2024, 1, 1, 0, 0, ts_s),
        "html": text.encode(),
        "text": text,
        "lang": "en",
        "source_partition": 0,
    }


def test_lww_gate_suppresses_cross_batch_stale(spark, tmp_path):
    wal = str(tmp_path / "wal")
    # batch 1: urls a (ts=10) and b (ts=5)
    _write_segment(wal, 0, [_row(0, "https://a", 10, "a0"), _row(1, "https://b", 5, "b0")])
    # batch 2: stale re-delivery for a (ts=3 < 10), fresher for b (ts=9),
    # plus an in-batch duplicate pair for c (only the winner may pass)
    _write_segment(
        wal,
        2,
        [
            _row(2, "https://a", 3, "a-stale"),
            _row(3, "https://b", 9, "b1"),
            _row(4, "https://c", 1, "c0"),
            _row(5, "https://c", 2, "c1"),
        ],
    )

    stream = open_stream(spark, wal, schema=WAL_SCHEMA_V1, max_files_per_trigger=1)
    out: list[dict] = []

    def sink(df, epoch_id):
        out.extend((epoch_id, r["url"], r["text"], r["seq"]) for r in df.collect())

    q = (
        lww_gate(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = {(u, t) for _, u, t, _ in out}
    # a's stale re-delivery suppressed by CROSS-batch state; b updated;
    # only c's in-batch winner passed
    assert emitted == {
        ("https://a", "a0"),
        ("https://b", "b0"),
        ("https://b", "b1"),
        ("https://c", "c1"),
    }
    # per url per batch at most one row
    seen = [(e, u) for e, u, _, _ in out]
    assert len(seen) == len(set(seen))
