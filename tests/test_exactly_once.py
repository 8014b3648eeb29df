"""Exactly-once hardening (SURVEY.md §7.3 step 5): double-apply no-ops,
crash between data write and manifest commit is recoverable, forced
re-merge is state-identical (LWW backstop), time travel sees history."""

from __future__ import annotations

import os

from cdc_engine import CdcConfig, SnapLake, apply_epoch, replay
from cdc_engine.lake import _stable_hash
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import read_seq_range
from cdc_engine.verify import assert_matches_oracle


def test_double_apply_epoch_is_noop(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    batch = read_seq_range(spark, wal_dir, 0, 2000)
    r1 = apply_epoch(spark, lake, batch, epoch_id=0)
    assert r1 is not None
    v = lake.head_version()
    assert apply_epoch(spark, lake, batch, epoch_id=0) is None
    assert lake.head_version() == v


def test_crash_between_write_and_commit_recovers(spark, wal_basic, tmp_path):
    """Simulate a foreachBatch retry after the data files landed but the
    manifest swap never happened: the orphan commit dir must be cleared and
    the retry must commit normally."""
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    # plant the orphan: deterministic commit_id for epoch 0
    uuid = lake.manifest()["table_uuid"]
    commit_id = "c" + _stable_hash(f"{uuid}:0")
    orphan = os.path.join(lake.path, "data", commit_id, "_bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    assert_matches_oracle(lake.scan(spark), oracle)


def test_forced_remerge_is_state_identical(spark, wal_basic, tmp_path):
    """Even bypassing the ledger (simulated duplicate epoch under a NEW
    epoch_id), LWW merge semantics make the re-apply a logical no-op."""
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    batch = read_seq_range(spark, wal_dir, 0, 2000)
    apply_epoch(spark, lake, batch, epoch_id=0)
    h = lake.state_hash(spark)
    apply_epoch(spark, lake, batch, epoch_id=999)  # duplicate delivery, new id
    assert lake.state_hash(spark) == h


def test_time_travel(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch)
    replay(spark, lake, wal_dir, cfg, max_epochs=1)
    v1 = lake.head_version()
    h1 = lake.state_hash(spark, version=v1)
    replay(spark, lake, wal_dir, cfg)
    assert lake.head_version() > v1
    # old snapshot still readable and unchanged
    assert lake.state_hash(spark, version=v1) == h1
    assert lake.state_hash(spark) != h1
