"""Property-style tests (seeded, SURVEY.md §5.3): the final table state is
invariant to (a) how the WAL is cut into epochs and (b) duplicated
re-delivery of any slice — the two properties that make any batching /
retry schedule safe."""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, apply_epoch, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import read_seq_range
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _wal(tmp_path):
    wcfg = WalConfig(n_events=4_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001)
    wal_dir = str(tmp_path / "wal")
    oracle = generate_wal(wal_dir, wcfg)
    return wal_dir, oracle


def test_state_invariant_to_epoch_cutting(spark, tmp_path):
    wal_dir, _ = _wal(tmp_path)
    hashes = []
    for e in (500, 1_000, 4_000):
        lake = SnapLake.create(str(tmp_path / f"lake{e}"), PAGES_SCHEMA_V1, n_buckets=8)
        replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=e))
        hashes.append(lake.state_hash(spark))
    assert hashes[0] == hashes[1] == hashes[2]


def test_state_invariant_to_redelivered_slices(spark, tmp_path):
    """Re-deliver overlapping seq windows out of order under fresh epoch
    ids — the union still converges to the oracle state."""
    wal_dir, _ = _wal(tmp_path)
    ref = SnapLake.create(str(tmp_path / "ref"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, ref, wal_dir, CdcConfig(events_per_epoch=1_000))

    chaotic = SnapLake.create(str(tmp_path / "chaos"), PAGES_SCHEMA_V1, n_buckets=8)
    windows = [(2_000, 4_000), (0, 2_500), (1_500, 4_000), (0, 1_000), (0, 4_000)]
    for i, (lo, hi) in enumerate(windows):
        apply_epoch(spark, chaotic, read_seq_range(spark, wal_dir, lo, hi), epoch_id=i)
    assert chaotic.state_hash(spark) == ref.state_hash(spark)
