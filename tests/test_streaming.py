"""T1/S9/T6: Structured Streaming ingest — availableNow drain matches the
oracle; a stop/restart against the same checkpoint resumes exactly where it
left off and converges to the same state (exactly-once, resumable)."""

from __future__ import annotations

import os
import shutil

from cdc_engine import CdcConfig, SnapLake, ingest_stream
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle
from cdc_engine.source import list_segments


def test_stream_drain_matches_oracle(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    ingest_stream(
        spark, lake, wal_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=CdcConfig(), available_now=True,
    )
    assert_matches_oracle(lake.scan(spark), oracle)
    # one ledger entry per micro-batch, all unique
    epochs = sorted(lake.committed_epochs())
    assert len(epochs) == len(set(epochs)) >= 1


def test_stream_resume_from_checkpoint(spark, wal_basic, tmp_path):
    """Segments arrive in two waves against one checkpoint: the restarted
    query must process only the new files and land on the oracle state."""
    wal_dir, wcfg, oracle = wal_basic
    staged = str(tmp_path / "staged_wal")
    segs = list_segments(wal_dir)
    assert len(segs) == 4

    def stage(upto: int):
        for first_seq, ver, path in segs[:upto]:
            d = os.path.join(staged, f"v{ver}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, os.path.basename(path))
            if not os.path.exists(dst):
                shutil.copy2(path, dst)

    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    stage(2)
    ingest_stream(spark, lake, staged, checkpoint_dir=ckpt, available_now=True)
    n_after_wave1 = len(lake.committed_epochs())
    assert n_after_wave1 >= 1

    stage(4)
    ingest_stream(spark, lake, staged, checkpoint_dir=ckpt, available_now=True)
    assert len(lake.committed_epochs()) > n_after_wave1
    assert_matches_oracle(lake.scan(spark), oracle)
