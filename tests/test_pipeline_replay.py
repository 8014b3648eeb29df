"""Pipelined MoR replay (CdcConfig.mor_pipeline > 1) is result-identical
to serial replay.

SURVEY.md §2.13: delta epochs never read table state, so `runner.replay`
overlaps them on a thread pool; only manifest publication serializes (via
the optimistic commit retry) and commits may interleave in any order.
These tests pin the equivalence that makes that safe: state hash, ledger
contents, and the per-epoch lineage multiset are identical at width 1, 2
(the default every other test runs under), and 4.
"""

from __future__ import annotations

from cdc_engine import CdcConfig, SnapLake, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.verify import assert_matches_oracle


def _replayed(spark, tmp_path, wal_dir, wcfg, width, name):
    lake = SnapLake.create(
        str(tmp_path / name), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(
        events_per_epoch=wcfg.events_per_epoch, n_buckets=8, mor_pipeline=width
    )
    replay(spark, lake, wal_dir, cfg)
    return lake


def test_pipelined_widths_equivalent(spark, wal_basic, tmp_path):
    wal_dir, wcfg, oracle = wal_basic
    lakes = {
        w: _replayed(spark, tmp_path, wal_dir, wcfg, w, f"lake_w{w}")
        for w in (1, 2, 4)
    }
    hashes = {w: lk.state_hash(spark) for w, lk in lakes.items()}
    assert hashes[2] == hashes[1] and hashes[4] == hashes[1], hashes
    assert_matches_oracle(lakes[4].scan(spark), oracle)

    # ledger: same dense epoch set with identical seq ranges, regardless
    # of the order the overlapped commits landed in
    ledgers = {
        w: {
            e: (v["first_seq"], v["last_seq"])
            for e, v in lk.committed_epochs().items()
        }
        for w, lk in lakes.items()
    }
    assert ledgers[2] == ledgers[1] and ledgers[4] == ledgers[1]

    # lineage: identical multiset of (epoch, pid, rows, bytes) rows —
    # pipelining must not drop, duplicate, or re-attribute lineage
    def lineage_key(lk):
        df = lk.lineage_df(spark)
        cols = [c for c in ("epoch_id", "pid", "rows_upserted", "rows_deleted") if c in df.columns]
        return sorted(tuple(r) for r in df.select(*cols).collect())

    l1 = lineage_key(lakes[1])
    assert lineage_key(lakes[2]) == l1 and lineage_key(lakes[4]) == l1


def test_cow_prefetch_equivalent_to_sequential(spark, wal_basic, tmp_path):
    """COW replay with the prepare/commit overlap (cow_prefetch=1, the
    default) is byte-identical to fully sequential COW replay: same state
    hash, ledger seq ranges, and lineage multiset — the prefetch only
    moves state-independent work, never reorders commits (round-4 verdict
    task 4)."""
    wal_dir, wcfg, oracle = wal_basic
    lakes = {}
    for depth in (0, 1):
        lake = SnapLake.create(
            str(tmp_path / f"lake_cowp{depth}"), PAGES_SCHEMA_V1,
            n_buckets=8, mode="cow",
        )
        cfg = CdcConfig(
            events_per_epoch=wcfg.events_per_epoch, n_buckets=8,
            cow_prefetch=depth,
        )
        replay(spark, lake, wal_dir, cfg)
        lakes[depth] = lake
    assert lakes[1].state_hash(spark) == lakes[0].state_hash(spark)
    assert_matches_oracle(lakes[1].scan(spark), oracle)

    def ledger(lk):
        return {
            e: (v["first_seq"], v["last_seq"])
            for e, v in lk.committed_epochs().items()
        }

    assert ledger(lakes[1]) == ledger(lakes[0])

    def lineage_key(lk):
        df = lk.lineage_df(spark)
        cols = [
            c
            for c in ("epoch_id", "pid", "rows_upserted", "rows_deleted")
            if c in df.columns
        ]
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert lineage_key(lakes[1]) == lineage_key(lakes[0])

    # resumability through the prefetch path: re-replay is a no-op
    assert replay(spark, lakes[1], wal_dir, CdcConfig(
        events_per_epoch=wcfg.events_per_epoch, n_buckets=8
    )) == []


def test_pipelined_resume_after_partial(spark, wal_basic, tmp_path):
    """Kill a pipelined replay after 2 epochs; resume pipelined: identical
    to a one-shot serial run (the ledger anti-join skips committed epochs
    no matter which overlapped commit landed last)."""
    wal_dir, wcfg, oracle = wal_basic
    lake = SnapLake.create(
        str(tmp_path / "lake_resume"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor"
    )
    cfg = CdcConfig(
        events_per_epoch=wcfg.events_per_epoch, n_buckets=8, mor_pipeline=4
    )
    replay(spark, lake, wal_dir, cfg, max_epochs=2)
    assert sorted(lake.committed_epochs()) == [0, 1]
    replay(spark, lake, wal_dir, cfg)
    serial = _replayed(spark, tmp_path, wal_dir, wcfg, 1, "lake_serial_ref")
    assert lake.state_hash(spark) == serial.state_hash(spark)
    assert_matches_oracle(lake.scan(spark), oracle)
