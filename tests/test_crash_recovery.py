"""Hard-crash recovery: SIGKILL a replay subprocess mid-flight, then resume
in-process. Whatever instant the kill hits (mid-write, mid-commit, between
epochs), the resumed replay must converge to the oracle state — the
end-to-end form of the exactly-once guarantee (atomic manifest commit +
ledger idempotence + LWW backstop)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
sys.path.insert(0, {repo!r})
from cdc_engine.session import build_session
from cdc_engine import CdcConfig, SnapLake, replay
wal, lake_dir = sys.argv[1], sys.argv[2]
spark = build_session("crashme", master="local[2]", shuffle_partitions=4)
lake = SnapLake.create(lake_dir, __import__("cdc_engine.schemas", fromlist=["x"]).PAGES_SCHEMA_V1, n_buckets=8)
print("READY", flush=True)
replay(spark, lake, wal, CdcConfig(events_per_epoch=1000))
print("DONE", flush=True)
"""


def test_sigkill_mid_replay_then_resume(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lake_dir = str(tmp_path / "lake")
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=REPO), wal_dir, lake_dir],
        stdout=subprocess.PIPE,
        text=True,
        env=env,
        cwd=REPO,
    )
    # wait until the child has created the lake and begun applying epochs,
    # then SIGKILL it at an arbitrary (nondeterministic) point mid-replay
    assert p.stdout.readline().strip() == "READY"
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if SnapLake.exists(lake_dir) and SnapLake(lake_dir).head_version() >= 1:
            break  # at least one epoch committed; kill mid-flight
        if p.poll() is not None:
            break  # finished before we could kill — still a valid resume test
        time.sleep(0.2)
    p.kill()
    p.wait()

    # recover in-process: the ledger skips whatever committed, orphaned
    # data dirs are cleared, uncommitted work is redone
    lake = SnapLake(lake_dir)
    assert SnapLake.exists(lake_dir)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=1000))
    assert sorted(lake.committed_epochs()) == list(range(wcfg.n_events // 1000))
    assert_matches_oracle(lake.scan(spark), oracle)
