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


def test_pruning_is_file_granular_within_a_bucket(spark, tmp_path):
    """A bucket holding one in-range and one out-of-range BASE file reads
    ONLY the in-range file (round-2 verdict finding #6: pruning used to
    apply the keep-set per bucket, dragging in every overlapping bucket's
    siblings). Today's writers emit one base file per touched bucket, so
    the two-base-files-in-one-bucket shape is hand-committed through the
    real metadata path (_walk_bucket_files + _advance_file_groups +
    _write_manifest) — the shape a size-targeted file writer would
    produce."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    lake = SnapLake.create(str(tmp_path / "lake_fg"), PAGES_SCHEMA_V1, n_buckets=1)
    base = dt.datetime(2023, 1, 1)

    def write_part(commit, day, n=5):
        d = os.path.join(lake.path, "data", commit, "_bucket=0")
        os.makedirs(d)
        tbl = pa.table(
            {
                "url": [f"https://d0.example.com/{commit}p{i}" for i in range(n)],
                "warc_ts": pa.array(
                    [base + dt.timedelta(days=day, minutes=i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "html": pa.array([b"<html></html>"] * n, pa.binary()),
                "text": [f"t{commit}.{i}" for i in range(n)],
                "lang": ["en"] * n,
                "_seq": pa.array(range(n), pa.int64()),
                "_deleted": pa.array([False] * n),
            }
        )
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))

    from cdc_engine.lake import _SideBundle, _walk_bucket_files

    write_part("c0", day=0)    # Jan 1 file
    write_part("c1", day=30)   # Jan 31 file, SAME bucket
    man = lake.manifest()
    new_files = _walk_bucket_files(lake.path, "data/c0") + _walk_bucket_files(
        lake.path, "data/c1"
    )
    assert len(new_files) == 2 and all(f["ts_min"] for f in new_files)
    bundle = _SideBundle(
        os.path.join("metadata", f"commit-{man['table_uuid'][:8]}-c01.json")
    )
    groups = lake._advance_file_groups(man, "c01", {0}, new_files, bundle)
    lake._write_side_json(bundle.rel_path, bundle.members)
    lake._write_manifest({**man, "version": 1, "parent": 0, "file_groups": groups})

    lo, hi = base - dt.timedelta(days=1), base + dt.timedelta(days=1)
    kept, total = lake.prunable_files(lo, hi)
    assert (kept, total) == (1, 2)

    bounded = lake.scan(spark, ts_min=lo, ts_max=hi)
    # the physical scan must reference exactly the one in-range file
    assert bounded.select(F.input_file_name()).distinct().count() == 1
    assert bounded.count() == 5
    # unbounded scan still sees both files' rows
    assert lake.scan(spark).count() == 10


def test_mor_bounded_scan_correct_despite_deltas(spark, wal_basic, tmp_path):
    """With delta files present, file pruning is disabled (it could hide a
    newer version) but the bounded scan is still row-correct."""
    lake, oracle = _setup(spark, tmp_path, wal_basic, "mor")
    lo = dt.datetime(2023, 11, 14, 22, 30)
    bounded = lake.scan(spark, ts_min=lo)
    want = oracle[oracle["warc_ts"] >= lo]
    assert bounded.count() == len(want)
