"""MoR deferred-dedup write path (cfg.mor_write_dedup=False): the epoch is
appended as-is — one shuffle — and LWW resolution happens entirely at
scan-collapse/compaction. Final table state must be byte-identical to the
dedup-on-write path, across out-of-order, duplicate and tombstone events."""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle


def _replay(spark, tmp_path, wal, wcfg, name, **cfg_kw):
    lake = SnapLake.create(str(tmp_path / name), PAGES_SCHEMA_V1, n_buckets=8, mode="mor")
    replay(spark, lake, wal, CdcConfig(events_per_epoch=wcfg.events_per_epoch, **cfg_kw))
    return lake


def test_deferred_dedup_state_identical(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    eager = _replay(spark, tmp_path, wal_dir, wcfg, "eager", mor_write_dedup=True)
    deferred = _replay(spark, tmp_path, wal_dir, wcfg, "deferred", mor_write_dedup=False)
    assert eager.state_hash(spark) == deferred.state_hash(spark)
    assert_matches_oracle(deferred.scan(spark), oracle.drop(columns=["fetch_status"], errors="ignore"))
    # the deferred delta really is bigger (it kept the duplicates)...
    rows = lambda lake: sum(f["rows"] for f in lake._files(lake.manifest()))
    assert rows(deferred) > rows(eager)


def test_deferred_dedup_survives_compaction(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    deferred = _replay(spark, tmp_path, wal_dir, wcfg, "d2", mor_write_dedup=False)
    h = deferred.state_hash(spark)
    deferred.compact(spark, sorted(deferred.bucket_file_counts()))
    assert deferred.state_hash(spark) == h
    # compaction folded the multiplicity away: now exactly one row per url
    # (live + tombstones), i.e. the eager shape
    internal = deferred.scan_internal(spark)
    assert internal.count() == internal.select("url").distinct().count()
