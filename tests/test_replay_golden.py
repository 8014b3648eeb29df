"""Golden end-to-end replay: full WAL -> final table state == oracle.

The primary correctness instrument (SURVEY.md §5.1): the mixed WAL already
contains updates, deletes, exact duplicate deliveries and out-of-order
events at the FIXTURES.md default rates.
"""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle


def _mk_lake(tmp_path, name="lake"):
    return SnapLake.create(str(tmp_path / name), PAGES_SCHEMA_V1, n_buckets=8)


def test_replay_matches_oracle(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lake = _mk_lake(tmp_path)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    results = replay(spark, lake, wal_dir, cfg)
    assert len(results) == 4  # 8000 events / 2000 per epoch
    assert_matches_oracle(lake.scan(spark), oracle)


def test_replay_is_idempotent(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lake = _mk_lake(tmp_path)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    replay(spark, lake, wal_dir, cfg)
    v1 = lake.head_version()
    h1 = lake.state_hash(spark)
    # re-running the whole replay must be a complete no-op
    assert replay(spark, lake, wal_dir, cfg) == []
    assert lake.head_version() == v1
    assert lake.state_hash(spark) == h1


def test_ledger_covers_wal_exactly(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = _mk_lake(tmp_path)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    replay(spark, lake, wal_dir, cfg)
    ledger = {e: v for e, v in lake.committed_epochs().items()}
    assert sorted(ledger) == [0, 1, 2, 3]  # dense & unique
    for k, entry in ledger.items():
        assert entry["first_seq"] == k * 2000
        assert entry["last_seq"] == k * 2000 + 1999


def test_resume_after_partial_replay(spark, wal_basic, tmp_path):
    """Kill after epoch 2, resume: final state identical to one-shot run."""
    wal_dir, wcfg, oracle = wal_basic
    lake = _mk_lake(tmp_path)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    replay(spark, lake, wal_dir, cfg, max_epochs=2)
    assert sorted(lake.committed_epochs()) == [0, 1]
    replay(spark, lake, wal_dir, cfg)  # resume from ledger
    assert sorted(lake.committed_epochs()) == [0, 1, 2, 3]
    assert_matches_oracle(lake.scan(spark), oracle)


def test_lineage_tiles_wal(spark, wal_basic, tmp_path):
    wal_dir, wcfg, _ = wal_basic
    lake = _mk_lake(tmp_path)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch, n_buckets=8)
    replay(spark, lake, wal_dir, cfg)
    lin = lake.lineage_df(spark).toPandas()
    assert set(lin["epoch_id"]) == {0, 1, 2, 3}
    # per-epoch seq coverage: min(first_seq)..max(last_seq) == epoch range
    g = lin.groupby("epoch_id").agg(lo=("first_seq", "min"), hi=("last_seq", "max"))
    for k, row in g.iterrows():
        assert row["lo"] == k * 2000 and row["hi"] == k * 2000 + 1999
    assert lin["rows_in"].sum() == 8_000
