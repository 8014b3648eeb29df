"""Incremental materialized-view maintenance (mview.py): incremental ==
full recompute across CDC epochs (updates, deletes, schema evolution, MoR
compaction), with bounded touched-bucket scans — never a full-table read."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_engine.lake import SnapLake
from cdc_engine.mview import AggSpec, IncrementalAggView
from cdc_engine.schemas import PAGES_SCHEMA_V1, WAL_SCHEMA_V1

TS = dt.datetime(2025, 1, 1)


def _batch(spark, rows):
    """rows: (seq, op, url, lang, text) — one-per-url (pre-deduped)."""
    data = [
        (seq, op, url, TS + dt.timedelta(seconds=seq), None, text, lang, 0)
        for (seq, op, url, lang, text) in rows
    ]
    return spark.createDataFrame(data, WAL_SCHEMA_V1)


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_mview_cow_updates_deletes(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    mv = IncrementalAggView(
        lake,
        "by_lang",
        ["lang"],
        [AggSpec("n", "count"), AggSpec("n_text", "count", "text")],
    )
    lake.merge(spark, _batch(spark, [
        (1, "upsert", "u/a", "en", "aaa"),
        (2, "upsert", "u/b", "en", None),
        (3, "upsert", "u/c", "fi", "ccc"),
        (4, "upsert", "u/d", None, "ddd"),
    ]), epoch_id=0)
    st = mv.full_refresh(spark)
    assert st["mode"] == "full" and st["synced_version"] == 1

    # epoch 1: update (lang flip), delete, insert
    lake.merge(spark, _batch(spark, [
        (5, "upsert", "u/a", "fi", "aa2"),   # en -> fi
        (6, "delete", "u/c", None, None),     # fi group shrinks
        (7, "upsert", "u/e", "sv", None),
    ]), epoch_id=1)
    # epoch 2: delete the last null-lang row -> group vanishes
    lake.merge(spark, _batch(spark, [(8, "delete", "u/d", None, None)]), epoch_id=2)

    st = mv.incremental_refresh(spark, route="incremental")
    assert st["mode"] == "incremental" and st["from_version"] == 1
    expect = _rows(
        lake.scan(spark).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"), F.count("text").alias("n_text")
        )
    )
    assert _rows(mv.df(spark)) == expect
    # (None,) lang group for u/d must be GONE, not zero
    assert not any(r[0] is None for r in _rows(mv.df(spark)))


def test_mview_sum_null_restoration(spark, tmp_path):
    """A SUM whose group loses all non-null inputs finalizes back to NULL —
    the hidden non-null counter, not a stale 0."""
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=4)
    mv = IncrementalAggView(
        lake, "sums", ["lang"],
        [AggSpec("n", "count"), AggSpec("s", "sum", "fetch_status")],
    )
    import pyspark.sql.types as T

    wal2 = T.StructType(
        list(WAL_SCHEMA_V1.fields) + [T.StructField("fetch_status", T.IntegerType(), True)]
    )

    def b(rows):
        return spark.createDataFrame(
            [
                (seq, op, url, TS, None, None, lang, 0, fs)
                for (seq, op, url, lang, fs) in rows
            ],
            wal2,
        )

    lake.merge(spark, b([(1, "upsert", "u/a", "en", 200), (2, "upsert", "u/b", "en", None)]), 0)
    mv.full_refresh(spark)
    lake.merge(spark, b([(3, "delete", "u/a", "en", None)]), 1)
    mv.incremental_refresh(spark, route="incremental")
    got = {r["lang"]: (r["n"], r["s"]) for r in mv.df(spark).collect()}
    assert got == {"en": (1, None)}  # sum NULL again, count 1 (u/b survives)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_mview_walgen_replay_matches_recompute(spark, tmp_path, wal_evolving, mode):
    """Full pipeline: replay an evolving WAL, sync the MV at an early
    version, incrementally catch up across updates/deletes/schema change
    (and, in MoR, delta files + possible compaction commits); result must
    equal a fresh GROUP BY over the final table."""
    from cdc_engine.config import CdcConfig
    from cdc_engine.runner import replay

    wal_dir, cfg, _oracle = wal_evolving
    lake = SnapLake.create(str(tmp_path / f"lake_{mode}"), PAGES_SCHEMA_V1, n_buckets=16, mode=mode)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=cfg.events_per_epoch))
    head = lake.head_version()
    assert head >= 3

    mv = IncrementalAggView(
        lake, "by_lang", ["lang"],
        [
            AggSpec("n", "count"),
            AggSpec("n_status", "count", "fetch_status"),
            AggSpec("status_sum", "sum", "fetch_status"),
        ],
    )
    # sync at an EARLY version (schema there predates fetch_status: the
    # missing-column NULL-fill path), then catch up head-v1 in ONE step
    mv.full_refresh(spark, version=1)
    st = mv.incremental_refresh(spark, route="incremental")
    assert st["mode"] == "incremental" and st["from_version"] == 1

    expect = _rows(
        lake.scan(spark).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("fetch_status").alias("n_status"),
            F.sum("fetch_status").alias("status_sum"),
        )
    )
    assert _rows(mv.df(spark)) == expect

    # idempotent noop when already at head
    assert mv.incremental_refresh(spark)["mode"] == "noop"


def test_mview_scan_is_bounded_to_touched_buckets(spark, tmp_path):
    """An epoch touching ONE url must refresh by scanning only that url's
    bucket — files_scanned << files_total (the whole point at 100 TB)."""
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=32)
    # seed: spread 64 urls across many buckets
    lake.merge(
        spark,
        _batch(spark, [(i, "upsert", f"u/{i}", "en", f"t{i}") for i in range(64)]),
        epoch_id=0,
    )
    mv = IncrementalAggView(lake, "v", ["lang"], [AggSpec("n", "count")])
    mv.full_refresh(spark)
    lake.merge(spark, _batch(spark, [(100, "upsert", "u/7", "fi", "x")]), epoch_id=1)
    st = mv.incremental_refresh(spark)
    assert st["mode"] == "incremental"
    assert st["touched_buckets"] == 1
    assert st["files_scanned_new"] < st["files_total_new"]
    assert _rows(mv.df(spark)) == _rows(
        lake.scan(spark).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    )


def test_mview_auto_routes_scattered_epoch_to_full(spark, tmp_path):
    """url-hash bucketing scatters a many-url epoch across most buckets;
    the delta would read touched buckets TWICE (both versions), so auto
    routing must recompute instead — and still be correct."""
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=8)
    lake.merge(
        spark,
        _batch(spark, [(i, "upsert", f"u/{i}", "en", "x") for i in range(64)]),
        epoch_id=0,
    )
    mv = IncrementalAggView(lake, "v", ["lang"], [AggSpec("n", "count")])
    mv.full_refresh(spark)
    lake.merge(
        spark,
        _batch(spark, [(100 + i, "upsert", f"u/{i}", "fi", "y") for i in range(32)]),
        epoch_id=1,
    )
    st = mv.incremental_refresh(spark)  # auto
    assert st["mode"] == "full"
    assert _rows(mv.df(spark)) == _rows(
        lake.scan(spark).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    )


def test_mview_rejects_non_maintainable():
    with pytest.raises(ValueError):
        AggSpec("m", "min", "fetch_status")
    with pytest.raises(ValueError):
        AggSpec("s", "sum", None)


def test_mview_full_fallback_after_expiry(spark, tmp_path):
    """If the synced snapshot was expired, incremental_refresh silently
    falls back to a full recompute instead of failing."""
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=4)
    mv = IncrementalAggView(lake, "v", ["lang"], [AggSpec("n", "count")])
    lake.merge(spark, _batch(spark, [(1, "upsert", "u/a", "en", "x")]), 0)
    mv.full_refresh(spark)
    for e in range(1, 13):  # push head far past keep_last
        lake.merge(spark, _batch(spark, [(10 + e, "upsert", f"u/{e}", "en", "y")]), e)
    lake.expire_snapshots(keep_last=3)
    st = mv.incremental_refresh(spark)
    assert st["mode"] == "full"
    assert _rows(mv.df(spark)) == _rows(
        lake.scan(spark).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    )


def test_mview_full_rebuild_after_lake_rollback(spark, tmp_path):
    """A rollback below the view's synced snapshot voids its delta
    ledger: the next refresh must FULL-rebuild from the rolled-back
    state, not raise and not serve stale numbers."""
    lake = SnapLake.create(str(tmp_path / "rb"), PAGES_SCHEMA_V1, n_buckets=8)
    mv = IncrementalAggView(lake, "by_lang", ["lang"], [AggSpec("n", "count")])
    lake.merge(spark, _batch(spark, [
        (1, "upsert", "u/a", "en", "x"),
        (2, "upsert", "u/b", "fi", "y"),
    ]), epoch_id=0)
    lake.merge(spark, _batch(spark, [
        (3, "upsert", "u/c", "en", "z"),
    ]), epoch_id=1)
    st = mv.incremental_refresh(spark)
    assert st["synced_version"] == 2
    lake.rollback(1)  # view now synced AHEAD of head
    st = mv.incremental_refresh(spark)
    assert st["mode"] == "full" and st["synced_version"] == 1
    got = {r["lang"]: r["n"] for r in mv.df(spark).collect()}
    assert got == {"en": 1, "fi": 1}  # u/c's epoch is gone again


def test_mview_rollback_below_schema_change_is_clear_error(spark, tmp_path):
    """If the rollback lands BELOW the commit that added a column the view
    aggregates, the rebuild must fail with a clear ValueError naming the
    column (SQL semantics: the table no longer has it), not a KeyError
    from the NULL-fill path."""
    import pyspark.sql.types as T

    lake = SnapLake.create(str(tmp_path / "rbsc"), PAGES_SCHEMA_V1, n_buckets=4)
    lake.merge(spark, _batch(spark, [(1, "upsert", "u/a", "en", "x")]), 0)
    wal2 = T.StructType(
        list(WAL_SCHEMA_V1.fields) + [T.StructField("fetch_status", T.IntegerType(), True)]
    )
    lake.merge(
        spark,
        spark.createDataFrame([(2, "upsert", "u/b", TS, None, None, "fi", 0, 200)], wal2),
        1,
    )
    mv = IncrementalAggView(
        lake, "v", ["lang"], [AggSpec("n", "count"), AggSpec("s", "sum", "fetch_status")]
    )
    mv.full_refresh(spark)
    lake.rollback(1)  # schema at v1 predates fetch_status
    with pytest.raises(ValueError, match="fetch_status"):
        mv.incremental_refresh(spark)


def test_mview_random_history_incremental_equals_recompute(spark, tmp_path):
    """Property (seeded, SURVEY.md §5.3 style): after EVERY epoch of a
    randomized CDC history — inserts, updates, deletes, NULL groups and
    NULL sum inputs, plus a mid-history MoR compaction (a physical-only
    commit whose delta must be exact zeros) — the incrementally
    maintained view equals a fresh GROUP BY over the live table."""
    import random
    import pyspark.sql.types as T

    rng = random.Random(20260817)
    wal2 = T.StructType(
        list(WAL_SCHEMA_V1.fields) + [T.StructField("fetch_status", T.IntegerType(), True)]
    )
    lake = SnapLake.create(str(tmp_path / "prop"), PAGES_SCHEMA_V1, n_buckets=8, mode="mor")
    mv = IncrementalAggView(
        lake, "p", ["lang"],
        [AggSpec("n", "count"), AggSpec("nfs", "count", "fetch_status"),
         AggSpec("s", "sum", "fetch_status")],
    )
    urls = [f"u/{i}" for i in range(40)]
    langs = ["en", "fi", "sv", None]
    seq, alive = 0, set()
    for e in range(8):
        rows = []
        for u in rng.sample(urls, rng.randint(1, 20)):  # one op per url
            seq += 1
            if u in alive and rng.random() < 0.3:
                rows.append((seq, "delete", u, TS, None, None, None, 0, None))
                alive.discard(u)
            else:
                fs = rng.choice([None, 200, 301, 404, 500])
                rows.append((seq, "upsert", u, TS, None, f"t{seq}", rng.choice(langs), 0, fs))
                alive.add(u)
        lake.merge(spark, spark.createDataFrame(rows, wal2), epoch_id=e)
        if e == 4:
            lake.compact(spark, sorted(lake.bucket_file_counts()))
        st = mv.incremental_refresh(spark, route="incremental")
        assert st["mode"] in ("incremental", "full"), st
        if e == 0:
            continue  # first refresh bootstraps as full
        expect = _rows(
            lake.scan(spark).groupBy("lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.count("fetch_status").alias("nfs"),
                F.sum("fetch_status").alias("s"),
            )
        )
        assert _rows(mv.df(spark)) == expect, f"diverged after epoch {e}"
