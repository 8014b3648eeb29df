"""Regression guard for the per-epoch action budget: a MoR epoch must
trigger exactly ONE driver-side collect (the combined stats aggregate)
plus the data write — the lineage aggregate must ride inside one of them
(Observation / combined agg), never as its own collect. Every extra
driver-side action is a job barrier that dilutes N->4N scaling
efficiency (the serial term in BENCH/ANALYSIS_r3.md).

Jobs-per-action is AQE-dependent (each exchange stage is its own DAG
job), so the guard counts ACTIONS, not jobs.
"""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, apply_epoch
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import read_seq_range
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _collects_for_epoch(spark, tmp_path, mode, mor_write_dedup, tag, monkeypatch):
    wal = str(tmp_path / f"wal_{tag}")
    generate_wal(
        wal,
        WalConfig(n_events=1_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001),
    )
    lake = SnapLake.create(
        str(tmp_path / f"lake_{tag}"), PAGES_SCHEMA_V1, n_buckets=8, mode=mode
    )
    cfg = CdcConfig(
        events_per_epoch=1_000, n_buckets=8, mor_write_dedup=mor_write_dedup
    )
    batch = read_seq_range(spark, wal, 0, 1_000)

    # patch the RUNTIME class (pyspark 4's classic.DataFrame overrides
    # collect, so patching the abstract pyspark.sql.DataFrame misses it)
    cls = type(batch)
    calls = {"n": 0}
    real_collect = cls.collect

    def counting(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(cls, "collect", counting)
    r = apply_epoch(spark, lake, batch, epoch_id=0, cfg=cfg)
    monkeypatch.undo()
    assert r is not None
    return calls["n"]


def test_mor_eager_epoch_is_one_collect(spark, tmp_path, monkeypatch):
    assert _collects_for_epoch(spark, tmp_path, "mor", True, "eager", monkeypatch) == 1


def test_mor_deferred_epoch_is_one_collect(spark, tmp_path, monkeypatch):
    assert (
        _collects_for_epoch(spark, tmp_path, "mor", False, "deferred", monkeypatch) == 1
    )
