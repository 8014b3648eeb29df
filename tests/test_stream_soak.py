"""Long-horizon STREAMING soak (round-5 verdict next-task 8): the same
bounds test_soak.py pins for 100-epoch replay, driven through
ingest_stream's foreachBatch path instead — segments arrive in waves
against one checkpoint (each wave is a query restart), compaction runs
interleaved per trigger, and throughout the horizon file counts, manifest
bytes, and the ledger must stay bounded, landing on the walgen oracle
state. Closes the last replay/streaming asymmetry in the durability
evidence."""

from __future__ import annotations

import os
import shutil

from cdc_engine import CdcConfig, SnapLake, ingest_stream
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import list_segments
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001

N_EPOCHS = 100
PER_EPOCH = 300
WAVE = 10


def _max_files_per_bucket(lake) -> int:
    files = lake._files(lake.manifest())
    per: dict[int, int] = {}
    for f in files:
        per[f["bucket"]] = per.get(f["bucket"], 0) + 1
    return max(per.values()) if per else 0


def test_stream_100_epoch_soak_bounds_hold_throughout(spark, tmp_path):
    wal = str(tmp_path / "wal_ssoak")
    oracle = generate_wal(
        wal,
        WalConfig(
            n_events=N_EPOCHS * PER_EPOCH,
            events_per_epoch=PER_EPOCH,
            schema_change_at_epoch=N_EPOCHS // 2,
            docs_parquet=DOCS_SF0001,
        ),
    )
    segs = list_segments(wal)
    assert len(segs) == N_EPOCHS

    staged = str(tmp_path / "staged")

    def stage(upto: int):
        for _first_seq, ver, path in segs[:upto]:
            d = os.path.join(staged, f"v{ver}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, os.path.basename(path))
            if not os.path.exists(dst):
                shutil.copy2(path, dst)

    lake = SnapLake.create(
        str(tmp_path / "lake_ssoak"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(events_per_epoch=PER_EPOCH, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    # streaming compacts via maybe_compact after EVERY committed trigger,
    # so the in-flight bound is tighter than pipelined replay's
    bound = cfg.compact_after_files + 2

    man_sizes: list[int] = []
    for step in range(WAVE, N_EPOCHS + 1, WAVE):
        stage(step)
        ingest_stream(
            spark, lake, staged, checkpoint_dir=ckpt, cfg=cfg,
            available_now=True, max_files_per_trigger=1,
        )
        n_committed = len(lake.committed_epochs())
        assert n_committed == step, (step, n_committed)
        mfb = _max_files_per_bucket(lake)
        assert mfb <= bound, (
            f"after wave to epoch {step}: {mfb} files in a bucket "
            f"(bound {bound}) — streaming compaction is not keeping up"
        )
        man_sizes.append(os.path.getsize(lake._manifest_path(lake.head_version())))

    # O(1) commit metadata across the streaming horizon (same slack as
    # the replay soak: schema evolution + fuller file groups)
    assert man_sizes[-1] <= 2 * man_sizes[0] + 4096, man_sizes

    # dense ledger: every micro-batch exactly once
    assert sorted(lake.committed_epochs()) == list(range(N_EPOCHS))

    # oracle state after the full horizon
    n, _h = lake.state_hash(spark)
    assert n == len(oracle)

    # bounded read amplification at the end
    assert len(lake._files(lake.manifest())) <= 8 * bound

    # exactly-once under re-drain: same checkpoint, no new files -> no-op
    h0 = lake.state_hash(spark)
    ingest_stream(
        spark, lake, staged, checkpoint_dir=ckpt, cfg=cfg,
        available_now=True, max_files_per_trigger=1,
    )
    assert len(lake.committed_epochs()) == N_EPOCHS
    assert lake.state_hash(spark) == h0
