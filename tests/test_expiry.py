"""Snapshot expiry + orphan vacuum (Iceberg expire_snapshots /
remove_orphan_files analog): retention completes the O(1)-metadata story —
without it old manifests and superseded data files accumulate forever.

Invariants proven here:
  * logical state (scan == oracle, state_hash) is untouched by expiry;
  * the ledger SURVIVES expiry: every committed epoch is still recognized,
    so a full re-replay after expiry is a byte-identical no-op;
  * time travel inside the retention window still works; outside it fails
    with FileNotFoundError (never silently wrong data);
  * vacuum actually deletes the superseded data/side files and never a
    referenced one.
"""

from __future__ import annotations

import os

import pytest

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle


def _disk_files(root: str) -> set[str]:
    out = set()
    for dirpath, _dirs, names in os.walk(root):
        out.update(os.path.relpath(os.path.join(dirpath, n), root) for n in names)
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_expire_preserves_state_and_ledger(spark, wal_basic, tmp_path, mode):
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(
        str(tmp_path / f"lake_{mode}"), PAGES_SCHEMA_V1, n_buckets=8, mode=mode
    )
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch)
    replay(spark, lake, wal_dir, cfg)
    if mode == "mor":
        lake.compact(spark, sorted(lake.bucket_file_counts()))
    head = lake.head_version()
    h_before = lake.state_hash(spark)
    before = _disk_files(lake.path)

    # MoR: the pre-compaction snapshot references every delta file, so only
    # expiring down to the compacted snapshot frees data files
    keep = 1 if mode == "mor" else 2
    stats = lake.expire_snapshots(keep_last=keep)
    assert stats["expired_manifests"] == head + 1 - keep
    assert stats["removed_data_files"] > 0  # superseded files really vacuumed
    after = _disk_files(lake.path)
    assert after < before  # strictly fewer files, nothing new

    # logical state untouched
    assert lake.state_hash(spark) == h_before
    assert_matches_oracle(lake.scan(spark), oracle)

    # retention-window time travel works; expired versions fail loudly
    assert lake.scan(spark, version=head).count() == lake.scan(spark).count()
    with pytest.raises(FileNotFoundError):
        lake.manifest(0)

    # exactly-once survives expiry: every epoch is still in the ledger and
    # a full re-replay is a no-op leaving the identical state
    n_epochs = wcfg.n_events // wcfg.events_per_epoch
    for e in range(n_epochs):
        assert lake.ledger_entry(e) is not None, e
    results = replay(spark, lake, wal_dir, cfg)
    assert results == []
    assert lake.state_hash(spark) == h_before


def test_expire_keeps_spilled_ledger_segments(tmp_path):
    """A long-lived table whose ledger has spilled must keep the segment
    chain through expiry (metadata-only simulation, no Spark)."""
    from tests.test_manifest_bounded import SCHEMA, _commit_metadata

    lake = SnapLake.create(str(tmp_path / "lake"), SCHEMA, n_buckets=16)
    for e in range(300):
        _commit_metadata(lake, e)
    stats = lake.expire_snapshots(keep_last=3)
    assert stats["expired_manifests"] == 298
    # spilled segments + index survived the vacuum
    for e in (0, 150, 299):
        assert lake.ledger_entry(e) is not None, e
    assert len(lake.committed_epochs()) == 300
    # and the vacuum did remove superseded side files (old file groups /
    # superseded ledger indexes)
    assert stats["removed_side_files"] > 0


def test_lineage_df_stops_at_expiry_horizon(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake_lin"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    full = lake.lineage_df(spark).count()
    lake.expire_snapshots(keep_last=2)
    kept = lake.lineage_df(spark).count()
    assert 0 < kept < full
