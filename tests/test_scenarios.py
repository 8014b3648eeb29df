"""The four spec-named replay scenarios (BASELINE.json:6): out-of-order
events, duplicate deliveries, tombstone deletes, mid-stream schema change.
Each uses a targeted WAL fixture with that failure mode amplified, checked
against the sequential pandas oracle.
"""

from __future__ import annotations

import pytest

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _run(spark, tmp_path, wcfg: WalConfig):
    wal_dir = str(tmp_path / "wal")
    oracle = generate_wal(wal_dir, wcfg)
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=wcfg.events_per_epoch))
    return lake, oracle


def test_out_of_order(spark, tmp_path):
    """40% of events arrive with warc_ts older than an already-applied
    version: they must be applied-then-ignored, never overwrite."""
    lake, oracle = _run(
        spark,
        tmp_path,
        WalConfig(n_events=6_000, events_per_epoch=1_500, pct_out_of_order=0.4,
                  docs_parquet=DOCS_SF0001),
    )
    assert_matches_oracle(lake.scan(spark), oracle)
    # late arrivals are counted, not silently dropped (T5)
    lin = lake.lineage_df(spark).toPandas()
    assert lin["rows_late_ignored"].sum() > 0


def test_duplicate_deliveries(spark, tmp_path):
    """30% exact re-deliveries under new seqs: LWW tie-break on seq keeps
    the payload identical; final state unaffected."""
    lake, oracle = _run(
        spark,
        tmp_path,
        WalConfig(n_events=6_000, events_per_epoch=1_500, pct_duplicate=0.3,
                  docs_parquet=DOCS_SF0001),
    )
    assert_matches_oracle(lake.scan(spark), oracle)


def test_tombstone_deletes(spark, tmp_path):
    """Heavy delete mix: deleted urls are absent from the live scan but the
    tombstone persists internally so an older out-of-order insert arriving
    later cannot resurrect the row."""
    lake, oracle = _run(
        spark,
        tmp_path,
        WalConfig(n_events=6_000, events_per_epoch=1_500, pct_delete=0.3,
                  pct_out_of_order=0.3, docs_parquet=DOCS_SF0001),
    )
    assert_matches_oracle(lake.scan(spark), oracle)
    # tombstones really are rows in the internal state
    internal = lake.scan_internal(spark)
    assert internal.where("_deleted").count() > 0


def test_mid_stream_schema_change(spark, wal_evolving, tmp_path):
    """WAL switches v1->v2 at epoch 2: fetch_status appears, source_partition
    widens int->long. Table schema evolves at exactly that epoch; rows whose
    winner predates the change read NULL fetch_status."""
    wal_dir, wcfg, oracle = wal_evolving
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch)
    replay(spark, lake, wal_dir, cfg, max_epochs=2)
    assert [f.name for f in lake.schema().fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]  # still v1 after v1 epochs
    replay(spark, lake, wal_dir, cfg)
    assert [f.name for f in lake.schema().fields] == [
        "url", "warc_ts", "html", "text", "lang", "fetch_status",
    ]  # evolved exactly at the v2 epoch
    assert_matches_oracle(lake.scan(spark), oracle)
    got = lake.scan(spark).toPandas()
    assert got["fetch_status"].isna().any() and got["fetch_status"].notna().any()


def test_schema_change_replay_from_scratch_matches(spark, wal_evolving, tmp_path):
    """Evolution is replay-stable: a fresh full replay lands on the same
    state hash as the incremental two-phase run."""
    wal_dir, wcfg, _ = wal_evolving
    cfg = CdcConfig(events_per_epoch=wcfg.events_per_epoch)
    a = SnapLake.create(str(tmp_path / "a"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, a, wal_dir, cfg, max_epochs=1)
    replay(spark, a, wal_dir, cfg, max_epochs=1)
    replay(spark, a, wal_dir, cfg)
    b = SnapLake.create(str(tmp_path / "b"), PAGES_SCHEMA_V1, n_buckets=8)
    replay(spark, b, wal_dir, cfg)
    assert a.state_hash(spark) == b.state_hash(spark)
