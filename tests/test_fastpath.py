"""MoR replay fast path (round-4 serial-term lever): with a known seq
window and footer-stat pid bounds, a MoR epoch must be exactly ONE Spark
job — zero driver-side collects — with input stats, lineage, quarantine
counts, and touched buckets all riding the write job's Observation. The
result (state, ledger, lineage) must be identical to the stats-job path."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cdc_engine import CdcConfig, SnapLake, apply_epoch, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import partition_pid_bounds, read_seq_range
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _mk_wal(tmp_path, tag, n=2_000, per_epoch=1_000):
    wal = str(tmp_path / f"wal_{tag}")
    generate_wal(
        wal, WalConfig(n_events=n, events_per_epoch=per_epoch, docs_parquet=DOCS_SF0001)
    )
    return wal


def test_fast_epoch_has_zero_collects(spark, tmp_path, monkeypatch):
    wal = _mk_wal(tmp_path, "zero")
    lake = SnapLake.create(
        str(tmp_path / "lake_zero"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8)
    batch = read_seq_range(spark, wal, 0, 1_000)
    bounds = partition_pid_bounds(wal, 0, 1_000)
    assert bounds is not None

    cls = type(batch)
    calls = {"n": 0}
    real_collect = cls.collect

    def counting(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(cls, "collect", counting)
    r = apply_epoch(
        spark, lake, batch, epoch_id=0, cfg=cfg,
        expected_seq_range=(0, 1_000), pid_bounds=bounds,
    )
    monkeypatch.undo()
    assert r is not None
    assert calls["n"] == 0, f"fast path ran {calls['n']} collects"


def test_fast_and_slow_paths_are_identical(spark, tmp_path):
    """Same WAL through replay (fast path) and through streaming-shaped
    apply_epoch calls (stats-job path): identical state hash, ledger seq
    ranges, and lineage rows (minus latency)."""
    wal = _mk_wal(tmp_path, "ab")
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8)

    fast = SnapLake.create(
        str(tmp_path / "lake_fast"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    replay(spark, fast, wal, cfg)

    slow = SnapLake.create(
        str(tmp_path / "lake_slow"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    for k in range(2):
        batch = read_seq_range(spark, wal, k * 1_000, (k + 1) * 1_000)
        apply_epoch(spark, slow, batch, epoch_id=k, cfg=cfg)  # no window/bounds

    assert fast.state_hash(spark) == slow.state_hash(spark)

    def led(lake):
        return {
            e: (v.get("first_seq"), v.get("last_seq"))
            for e, v in lake.committed_epochs().items()
        }

    assert led(fast) == led(slow)

    lin_cols = [
        "epoch_id", "partition_id", "first_seq", "last_seq", "rows_in",
        "rows_upserted", "rows_deleted", "rows_quarantined", "bytes",
    ]

    def lin(lake):
        rows = lake.lineage_df(spark).select(*lin_cols).collect()
        return sorted(tuple(r) for r in rows)

    assert lin(fast) == lin(slow)


def test_fast_path_quarantines_invalid_rows(spark, tmp_path):
    """Invalid rows (null url) are filtered from the delta, counted in the
    observation, and persisted to the quarantine dir before the commit."""
    wal = _mk_wal(tmp_path, "q")
    lake = SnapLake.create(
        str(tmp_path / "lake_q"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    qdir = str(tmp_path / "quarantine")
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8, quarantine_dir=qdir)
    batch = read_seq_range(spark, wal, 0, 1_000)
    poisoned = batch.withColumn(
        "url", F.when(F.col("seq") % 100 == 0, None).otherwise(F.col("url"))
    )
    r = apply_epoch(
        spark, lake, poisoned, epoch_id=0, cfg=cfg,
        expected_seq_range=(0, 1_000), pid_bounds=(0, 7),
    )
    assert r is not None
    qfiles = glob.glob(os.path.join(qdir, "epoch=0", "*.parquet"))
    assert qfiles, "quarantined rows were not persisted"
    qdf = spark.read.parquet(os.path.join(qdir, "epoch=0"))
    assert qdf.count() == 10
    lin = lake.lineage_df(spark)
    assert (
        lin.agg(F.sum("rows_quarantined")).collect()[0][0] == 10
    )
    # quarantined rows never reach the table
    assert lake.scan(spark).where(F.col("url").isNull()).count() == 0


def test_fast_path_ledger_covers_full_input_range(spark, tmp_path):
    """The ledger's recorded seq range must cover quarantined rows too
    (the consumed offset range, not just the applied rows)."""
    wal = _mk_wal(tmp_path, "rng")
    lake = SnapLake.create(
        str(tmp_path / "lake_rng"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8,
                    quarantine_dir=str(tmp_path / "q2"))
    batch = read_seq_range(spark, wal, 0, 1_000)
    # poison the FIRST and LAST seq of the window
    poisoned = batch.withColumn(
        "url", F.when(F.col("seq").isin(0, 999), None).otherwise(F.col("url"))
    )
    apply_epoch(
        spark, lake, poisoned, epoch_id=0, cfg=cfg,
        expected_seq_range=(0, 1_000), pid_bounds=(0, 7),
    )
    ent = lake.committed_epochs()[0]
    assert (ent["first_seq"], ent["last_seq"]) == (0, 999)
