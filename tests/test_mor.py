"""Merge-on-read mode: append-only delta commits + scan-time LWW collapse +
compaction must be logically indistinguishable from copy-on-write."""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle


def _replay(spark, tmp_path, wal_dir, wcfg, mode, compact_after=1000, name=None):
    lake = SnapLake.create(
        str(tmp_path / (name or f"lake_{mode}")), PAGES_SCHEMA_V1, n_buckets=8, mode=mode
    )
    cfg = CdcConfig(
        events_per_epoch=wcfg.events_per_epoch, compact_after_files=compact_after
    )
    replay(spark, lake, wal_dir, cfg)
    return lake


def test_mor_matches_oracle_and_cow(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    mor = _replay(spark, tmp_path, wal_dir, wcfg, "mor")
    cow = _replay(spark, tmp_path, wal_dir, wcfg, "cow")
    assert_matches_oracle(mor.scan(spark), oracle)
    assert mor.state_hash(spark) == cow.state_hash(spark)
    # and it really was append-only: deltas outnumber epochs' worth of base
    kinds = {f.get("kind", "base") for f in mor._files(mor.manifest())}
    assert "delta" in kinds


def test_mor_compaction_preserves_state_and_bounds_files(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    # compact aggressively: every bucket folds once it holds >2 files
    lake = _replay(spark, tmp_path, wal_dir, wcfg, "mor", compact_after=2, name="lake_compact")
    assert max(lake.bucket_file_counts().values()) <= 3  # bound holds mid-stream
    assert_matches_oracle(lake.scan(spark), oracle)
    # full manual compaction: all-base afterwards, state unchanged
    h = lake.state_hash(spark)
    lake.compact(spark, sorted(lake.bucket_file_counts()))
    assert all(f.get("kind", "base") == "base" for f in lake._files(lake.manifest()))
    assert lake.state_hash(spark) == h
    assert_matches_oracle(lake.scan(spark), oracle)


def test_mor_schema_change(spark, wal_evolving, tmp_path):
    wal_dir, wcfg, oracle = wal_evolving
    lake = _replay(spark, tmp_path, wal_dir, wcfg, "mor", name="lake_evo")
    assert_matches_oracle(lake.scan(spark), oracle)


def test_mor_idempotent_replay(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = _replay(spark, tmp_path, wal_dir, wcfg, "mor", name="lake_idem")
    v = lake.head_version()
    h = lake.state_hash(spark)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch)
    replay(spark, lake, wal_dir, cfg)
    assert lake.head_version() == v and lake.state_hash(spark) == h
