"""Broadcast CDC-apply for COW (round-6 scaling lever): when the epoch's
estimated winners fit a broadcast, merge swaps the full-outer shuffle join
for target LEFT JOIN broadcast(batch) + batch ANTI JOIN url-only target —
the wide target never enters a join exchange; the only full-width shuffle
left is the bucket repartition before the write. Must be byte-identical to
the join path in state, ledger, and lineage, and the plan must actually
broadcast."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_engine import CdcConfig, SnapLake, replay, timing
from cdc_engine.lake import _cow_broadcast_plan
from cdc_engine.schemas import PAGES_SCHEMA_V1
from gen.walgen import WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _mk_wal(tmp_path, tag, n=10_000, per_epoch=2_000):
    wal = str(tmp_path / f"wal_{tag}")
    generate_wal(
        wal,
        WalConfig(
            n_events=n,
            events_per_epoch=per_epoch,
            schema_change_at_epoch=3,
            docs_parquet=DOCS_SF0001,
        ),
    )
    return wal


def _replay(spark, tmp_path, wal, tag, cfg):
    lake = SnapLake.create(
        str(tmp_path / f"lake_{tag}"), PAGES_SCHEMA_V1, n_buckets=16, mode="cow"
    )
    replay(spark, lake, wal, cfg)
    return lake


def test_broadcast_and_join_paths_identical(spark, tmp_path, monkeypatch):
    """State hash, ledger seq ranges, and lineage rows must be identical
    between the broadcast apply and the full-outer join apply — across a
    mid-WAL schema change — and each run must take the path it claims
    (timing markers)."""
    monkeypatch.setenv("CDC_TIMING", "1")
    wal = _mk_wal(tmp_path, "ab")
    timing.drain()
    # ratio gate off: force the broadcast plan on EVERY epoch (the default
    # ratio would route target~batch epochs to the join path by design)
    a = _replay(
        spark, tmp_path, wal, "bcast",
        CdcConfig(
            events_per_epoch=2_000, n_buckets=16, cow_merge="join",
            cow_broadcast_min_ratio=0,
        ),
    )
    marks_a = {n for n, _ in timing.drain() if n.startswith("cow_apply")}
    b = _replay(
        spark, tmp_path, wal, "join",
        CdcConfig(
            events_per_epoch=2_000, n_buckets=16, cow_merge="join",
            cow_broadcast_rows=0,
        ),
    )
    marks_b = {n for n, _ in timing.drain() if n.startswith("cow_apply")}
    # round-7 default: the ONE-EXCHANGE union+window merge
    c = _replay(
        spark, tmp_path, wal, "window",
        CdcConfig(events_per_epoch=2_000, n_buckets=16),
    )
    marks_c = {n for n, _ in timing.drain() if n.startswith("cow_apply")}
    assert marks_a == {"cow_apply_broadcast"}
    assert marks_b == {"cow_apply_join"}
    assert marks_c == {"cow_apply_window"}
    assert a.state_hash(spark) == b.state_hash(spark)
    assert a.state_hash(spark) == c.state_hash(spark)

    led_cols = ["epoch_id", "first_seq", "last_seq"]
    led_a = sorted(map(tuple, a.ledger_df(spark).select(*led_cols).toPandas().values.tolist()))
    led_b = sorted(map(tuple, b.ledger_df(spark).select(*led_cols).toPandas().values.tolist()))
    led_c = sorted(map(tuple, c.ledger_df(spark).select(*led_cols).toPandas().values.tolist()))
    assert led_a == led_b == led_c

    drop = {"apply_latency_ms", "snapshot_id", "table"}
    lin_a = a.lineage_df(spark).toPandas()
    lin_b = b.lineage_df(spark).toPandas()
    lin_c = c.lineage_df(spark).toPandas()
    cols = sorted(col for col in lin_a.columns if col not in drop)
    ka = sorted(map(tuple, lin_a[cols].fillna(-1).values.tolist()))
    kb = sorted(map(tuple, lin_b[cols].fillna(-1).values.tolist()))
    kc = sorted(map(tuple, lin_c[cols].fillna(-1).values.tolist()))
    assert ka == kb == kc


def test_byte_threshold_falls_back_to_join(spark, tmp_path, monkeypatch):
    """A tiny cow_broadcast_bytes bound must force the join path (the
    estimated winner bytes exceed it) — the gate is real, not cosmetic."""
    monkeypatch.setenv("CDC_TIMING", "1")
    wal = _mk_wal(tmp_path, "gate", n=2_000, per_epoch=1_000)
    timing.drain()
    _replay(
        spark, tmp_path, wal, "gated",
        CdcConfig(
            events_per_epoch=1_000, n_buckets=16, cow_merge="join",
            cow_broadcast_bytes=16,
        ),
    )
    marks = {n for n, _ in timing.drain() if n.startswith("cow_apply")}
    assert marks == {"cow_apply_join"}


def test_ratio_gate_routes_by_carried_volume(spark, tmp_path, monkeypatch):
    """The default gate keeps target~batch epochs on the JOIN path (the
    measured-better plan there — and the exact engine the scaling bench
    runs), while a small epoch against a much larger standing table takes
    the broadcast path."""
    from cdc_engine.apply import commit_prepared, prepare_epoch
    from cdc_engine.source import read_seq_range

    monkeypatch.setenv("CDC_TIMING", "1")
    wal = _mk_wal(tmp_path, "ratio")
    timing.drain()
    # base replay, default config: every epoch's carried volume is within
    # a few x of its batch -> join path throughout
    lake = _replay(
        spark, tmp_path, wal, "ratio",
        CdcConfig(events_per_epoch=2_000, n_buckets=16, cow_merge="join"),
    )
    assert {n for n, _ in timing.drain() if n.startswith("cow_apply")} == {"cow_apply_join"}

    # a 100-event epoch against the 10k-event table: carried >> batch
    wal_small = _mk_wal(tmp_path, "ratio_small", n=100, per_epoch=100)
    batch = read_seq_range(spark, wal_small, 0, 100)
    cfg = CdcConfig(
        events_per_epoch=100, n_buckets=16, cow_merge="join",
        cow_broadcast_min_ratio=3,
    )
    prep = prepare_epoch(spark, lake, batch, 99, cfg, None, materialize=True)
    assert prep is not None and prep.cow_broadcast is True
    timing.drain()
    assert commit_prepared(spark, lake, prep) is not None
    assert {n for n, _ in timing.drain() if n.startswith("cow_apply")} == {
        "cow_apply_broadcast"
    }


def test_plan_broadcasts_and_rows_match_full_outer(spark):
    """_cow_broadcast_plan: (1) the update branch is a BroadcastHashJoin —
    the wide target side has NO shuffle exchange before the join; (2) the
    (t, s) struct rows are exactly the full-outer join's rows on the same
    inputs, including t-NULL inserts and s-NULL carries."""
    tgt = spark.createDataFrame(
        [(f"u{i}", f"old{i}", 100 + i) for i in range(50)],
        "url string, html string, __seq long",
    )
    src = spark.createDataFrame(
        [(f"u{i}", f"new{i}", 1000 + i, "upsert") for i in range(25, 75)],
        "url string, html string, seq long, op string",
    )
    j = _cow_broadcast_plan(tgt, src)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    key = lambda p: (p[0] or "", p[1] or "")
    got = sorted(
        (
            (
                None if r["t"] is None else r["t"]["url"],
                None if r["s"] is None else r["s"]["url"],
            )
            for r in j.collect()
        ),
        key=key,
    )
    fo = tgt.alias("t").join(
        src.alias("s"), F.col("t.url") == F.col("s.url"), "full_outer"
    )
    fo_rows = sorted(
        ((r[0], r[1]) for r in fo.select(F.col("t.url"), F.col("s.url")).collect()),
        key=key,
    )
    assert got == fo_rows
    # every matched/carried row keeps target values; winners are picked
    # downstream — here just check multiplicity: 50 target + 25 inserts
    assert j.count() == 75
