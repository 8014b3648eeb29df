"""Ledger-identity guard: an epoch_id hit in the ledger is only honored when
the committed entry's recorded seq range matches the incoming batch — a
stale id from a DIFFERENT batching (changed events_per_epoch, fresh
checkpoint over a replayed lake) must fail loudly instead of silently
skipping never-applied data (the exactly-once data-loss advisory)."""

from __future__ import annotations

import datetime as dt

import pytest

from cdc_engine import CdcConfig, SnapLake, apply_epoch, replay
from cdc_engine.apply import LedgerSeqMismatch
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.textex import wrap_html


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        "text string, lang string, source_partition int",
    )


def _row(seq, url="https://a/x"):
    return (seq, "insert", url, dt.datetime(2024, 1, 1, 0, 0, seq % 60),
            wrap_html(f"t{seq}"), f"t{seq}", "en", 0)


def test_replay_with_changed_epoch_size_fails_loudly(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    # same WAL, halved epoch size: epoch 0 now means seqs [0, 1000) but the
    # ledger's epoch 0 covers [0, 2000) — silent skip would lose data
    with pytest.raises(LedgerSeqMismatch):
        replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch // 2))
    # the original batching still resumes as a clean no-op
    assert replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch)) == []


def test_streaming_redelivery_verified_against_batch_range(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    assert apply_epoch(spark, lake, _batch(spark, [_row(0), _row(1)]), epoch_id=0) is not None
    # true re-delivery of the same contents under the same epoch id: no-op
    assert apply_epoch(spark, lake, _batch(spark, [_row(0), _row(1)]), epoch_id=0) is None
    # same epoch id but DIFFERENT contents (seq range outside the committed
    # one) — e.g. a fresh checkpoint renumbering batches: must raise
    with pytest.raises(LedgerSeqMismatch):
        apply_epoch(spark, lake, _batch(spark, [_row(5), _row(6)]), epoch_id=0)


def test_quarantined_rows_counted_in_lineage(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    rows = [
        _row(0),
        (1, "insert", None, dt.datetime(2024, 1, 1), wrap_html("b"), "b", "en", 0),
        (2, "insert", "https://c/x", None, wrap_html("c"), "c", "en", 0),
    ]
    r = apply_epoch(spark, lake, _batch(spark, rows), epoch_id=0)
    assert r is not None
    lin = lake.lineage_df(spark).collect()
    assert sum(x["rows_quarantined"] for x in lin) == 2
    assert sum(x["rows_in"] for x in lin) == 1
    # consumed offset range covers the quarantined rows too (S6 semantics)
    assert min(x["first_seq"] for x in lin) == 0
    assert max(x["last_seq"] for x in lin) == 2


def test_all_rows_quarantined_is_a_noop(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    bad = [(0, "insert", None, dt.datetime(2024, 1, 1), None, None, "en", 0)]
    assert apply_epoch(spark, lake, _batch(spark, bad), epoch_id=0) is None
    assert lake.head_version() == 0
