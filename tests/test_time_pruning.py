"""Manifest-level time pruning: footer-stat warc_ts ranges let bounded
scans skip files (the days(warc_ts) partition-pruning analog), without ever
compromising LWW correctness in MoR mode."""

from __future__ import annotations

import datetime as dt

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1


def _setup(spark, tmp_path, wal_basic, mode):
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(str(tmp_path / f"lake_{mode}"), PAGES_SCHEMA_V1, n_buckets=8, mode=mode)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    return lake, oracle


def test_manifest_records_ts_ranges(spark, wal_basic, tmp_path):
    lake, _ = _setup(spark, tmp_path, wal_basic, "cow")
    files = lake._files(lake.manifest())
    assert files and all(f["ts_min"] is not None and f["ts_max"] is not None for f in files)


def test_bounded_scan_equals_filtered_full_scan(spark, wal_basic, tmp_path):
    lake, oracle = _setup(spark, tmp_path, wal_basic, "cow")
    # fixture timestamps: BASE + seq seconds (2023-11-14T22:13:20Z epoch)
    lo = dt.datetime(2023, 11, 14, 22, 30)
    hi = dt.datetime(2023, 11, 14, 23, 0)
    bounded = lake.scan(spark, ts_min=lo, ts_max=hi)
    full = lake.scan(spark).where((f"warc_ts >= '{lo}' and warc_ts <= '{hi}'"))
    assert bounded.exceptAll(full).isEmpty() and full.exceptAll(bounded).isEmpty()
    want = oracle[(oracle["warc_ts"] >= lo) & (oracle["warc_ts"] <= hi)]
    assert bounded.count() == len(want)


def test_mor_bounded_scan_correct_despite_deltas(spark, wal_basic, tmp_path):
    """With delta files present, file pruning is disabled (it could hide a
    newer version) but the bounded scan is still row-correct."""
    lake, oracle = _setup(spark, tmp_path, wal_basic, "mor")
    lo = dt.datetime(2023, 11, 14, 22, 30)
    bounded = lake.scan(spark, ts_min=lo)
    want = oracle[oracle["warc_ts"] >= lo]
    assert bounded.count() == len(want)
