"""Streaming one-job fast path (round-4 verdict task 2) + NULL-pid WAL
degradation (round-4 ADVICE, medium).

The foreachBatch path derives each micro-batch's seq window and pid
universe from the trigger files' parquet footers (batch_df.inputFiles(),
no Spark job), so a *streaming* MoR epoch takes the same zero-collect
fast path as replay — the pre-commit stats barrier was the last known
per-epoch serial term unique to tail mode. A WAL holding NULL
source_partition values must make the footer bounds decline (NULLs are
invisible to min/max stats) and the epoch fall back to the stats-job
path, never fail merge's completeness check.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.runner import ingest_stream
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.source import footer_epoch_bounds, list_segments, partition_pid_bounds
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _mk_wal(tmp_path, tag, n=2_000, per_epoch=1_000):
    wal = str(tmp_path / f"wal_{tag}")
    generate_wal(
        wal, WalConfig(n_events=n, events_per_epoch=per_epoch, docs_parquet=DOCS_SF0001)
    )
    return wal


def test_streaming_mor_epochs_zero_collects_and_replay_parity(
    spark, tmp_path, monkeypatch
):
    wal = _mk_wal(tmp_path, "sfp")
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8)

    streamed = SnapLake.create(
        str(tmp_path / "lake_stream"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    calls = {"n": 0}
    real_collect = ClassicDF.collect

    def counting(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(ClassicDF, "collect", counting)
    ingest_stream(
        spark, streamed, wal, str(tmp_path / "ckpt_sfp"), cfg=cfg,
        available_now=True, max_files_per_trigger=1,
    )
    monkeypatch.undo()
    assert calls["n"] == 0, (
        f"streaming MoR epochs ran {calls['n']} driver collects — the "
        f"foreachBatch fast path is not engaging (job-count parity with "
        f"replay lost)"
    )

    replayed = SnapLake.create(
        str(tmp_path / "lake_replay"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    replay(spark, replayed, wal, cfg)
    assert streamed.state_hash(spark) == replayed.state_hash(spark)


def test_streaming_fastpath_across_schema_change_multifile_trigger(
    spark, tmp_path
):
    """A 2-file trigger whose batch straddles the mid-stream schema change
    (one v1 + one v2 segment) must still take the footer-bounds path —
    mixed int32/int64 source_partition stats, union seq window — and land
    byte-identical to replay."""
    wal = str(tmp_path / "wal_sc")
    generate_wal(
        wal,
        WalConfig(
            n_events=4_000, events_per_epoch=1_000, schema_change_at_epoch=2,
            docs_parquet=DOCS_SF0001,
        ),
    )
    paths = [p for _f, _v, p in list_segments(wal)]
    assert len(paths) == 4
    # the straddling pair (v1 seg 1 + v2 seg 2): bounds must resolve
    seq_rng, pid_b = footer_epoch_bounds(paths[1:3])
    assert seq_rng == (1_000, 2_999)
    assert pid_b is not None

    cfg = CdcConfig(events_per_epoch=2_000, n_buckets=8)
    streamed = SnapLake.create(
        str(tmp_path / "lake_sc_stream"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    ingest_stream(
        spark, streamed, wal, str(tmp_path / "ckpt_sc"), cfg=cfg,
        available_now=True, max_files_per_trigger=2,
    )
    replayed = SnapLake.create(
        str(tmp_path / "lake_sc_replay"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    replay(spark, replayed, wal, cfg)
    assert streamed.state_hash(spark) == replayed.state_hash(spark)
    # the evolved column arrived through the streaming path too
    assert "fetch_status" in [f.name for f in streamed.scan(spark).schema.fields]


def _null_some_pids(wal: str) -> None:
    """Rewrite the first WAL segment with NULL source_partition on every
    10th row (footer stats then carry null_count > 0)."""
    _first, _ver, path = list_segments(wal)[0]
    t = pq.read_table(path)
    idx = t.schema.get_field_index("source_partition")
    col = t.column(idx).to_pylist()
    col = [None if i % 10 == 0 else v for i, v in enumerate(col)]
    t = t.set_column(idx, t.schema.field(idx), pa.array(col, t.schema.field(idx).type))
    pq.write_table(t, path)


def test_null_pid_wal_declines_footer_bounds_and_still_replays(spark, tmp_path):
    wal = _mk_wal(tmp_path, "nullpid")
    _null_some_pids(wal)

    # NULL pids are invisible to min/max footer stats: both bound readers
    # must decline rather than claim a complete pid universe
    assert partition_pid_bounds(wal, 0, 2_000) is None
    paths = [p for _f, _v, p in list_segments(wal)]
    seq_rng, pid_b = footer_epoch_bounds(paths)
    assert seq_rng == (0, 1_999)
    assert pid_b is None

    # end-to-end: replay must fall back to the stats-job path and commit
    # (pre-fix this raised merge's sum(seen) != total RuntimeError), with
    # the NULL-pid rows landing in the pid=None lineage slot
    lake = SnapLake.create(
        str(tmp_path / "lake_nullpid"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(events_per_epoch=1_000, n_buckets=8)
    res = replay(spark, lake, wal, cfg)
    assert len(res) == 2
    lin = lake.lineage_df(spark)
    assert lin.where("epoch_id = 0 and partition_id is null").count() == 1
    n, _h = lake.state_hash(spark)
    assert n > 0
