"""Tail mode (processing-time trigger, runs forever) and the main.py CLI
ingest path — the production entry points."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from cdc_engine import CdcConfig, SnapLake, ingest_stream
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tail_mode_applies_then_stops(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    q = ingest_stream(
        spark, lake, wal_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=CdcConfig(), available_now=False,  # processing-time tail
        max_files_per_trigger=4, await_termination=False,
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline and len(lake.committed_epochs()) < 1:
            time.sleep(0.5)
        assert len(lake.committed_epochs()) >= 1
        # drain: wait until all 4 segments are applied, then stop the tail
        while time.monotonic() < deadline and lake.scan(spark).count() != len(oracle):
            time.sleep(0.5)
    finally:
        q.stop()
    assert_matches_oracle(lake.scan(spark), oracle)


def test_cli_ingest_available_now(wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1", SPARK_GRAFT_CPUS="4")
    lake_dir = str(tmp_path / "clilake")
    r = subprocess.run(
        [
            sys.executable, "main.py", "ingest",
            "--wal", wal_dir, "--lake", lake_dir,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--mode", "mor", "--n-buckets", "8",
        ],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == len(oracle)
