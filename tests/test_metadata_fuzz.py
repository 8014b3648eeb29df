"""Randomized metadata-operation soak: seeded interleavings of
tag / rollback(+catch-up replay) / compact / rebucket / expire /
idempotent re-replay against one WAL. After EVERY op the lake must hold
the golden state hash and pass fsck — the single-writer lifecycle a real
table lives through (undo, re-ingest, layout changes, retention) in
arbitrary order. Complements the targeted tests (test_rollback,
test_rebucket, test_expiry) with the interleavings nobody writes by hand."""

from __future__ import annotations

import os
import random

import pytest

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1

N_STEPS = 5


def _existing_versions(lake) -> list[int]:
    return [
        v
        for v in range(lake.head_version() + 1)
        if os.path.isfile(lake._manifest_path(v))
    ]


@pytest.mark.parametrize("mode", ["cow", "mor"])
@pytest.mark.parametrize("seed", [7, 23])
def test_metadata_op_fuzz_holds_golden_state(spark, tmp_path, wal_basic, mode, seed):
    wal_dir, wcfg, _oracle = wal_basic
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    lake = SnapLake.create(
        str(tmp_path / f"fz_{mode}_{seed}"), PAGES_SCHEMA_V1, n_buckets=8, mode=mode
    )
    replay(spark, lake, wal_dir, cfg)
    golden = lake.state_hash(spark)

    rng = random.Random(seed)
    trace = []
    for step in range(N_STEPS):
        op = rng.choice(["tag", "rollback", "compact", "rebucket", "expire", "replay"])
        trace.append(op)
        if op == "tag":
            lake.tag(f"fz{step}")
        elif op == "rollback":
            # target must still have a manifest and not strand a tag above it
            floor = max(lake.tags().values(), default=1)
            candidates = [v for v in _existing_versions(lake) if v >= max(floor, 1)]
            if candidates:
                lake.rollback(rng.choice(candidates))
                replay(spark, lake, wal_dir, cfg)  # catch back up through the ledger
        elif op == "compact":
            lake.maybe_compact(spark, 1)  # force a full fold
        elif op == "rebucket":
            nb = rng.choice([m for m in (4, 8, 16) if m != lake.manifest()["n_buckets"]])
            lake.rebucket(spark, nb)
        elif op == "expire":
            lake.expire_snapshots(keep_last=rng.randint(1, 3))
        elif op == "replay":
            assert replay(spark, lake, wal_dir, cfg) == []  # idempotent no-op
        assert lake.state_hash(spark) == golden, f"state diverged: {trace}"
        rep = lake.fsck(deep=(step == N_STEPS - 1))
        assert rep["ok"] and not rep["errors"], f"fsck after {trace}: {rep}"
