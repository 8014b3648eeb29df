"""SnapLake.changes: change data feed between snapshots (CDC-out)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_engine.lake import SnapLake
from cdc_engine.schemas import PAGES_SCHEMA_V1, WAL_SCHEMA_V1

TS = dt.datetime(2025, 1, 1)


def _batch(spark, rows):
    data = [
        (seq, op, url, TS + dt.timedelta(seconds=seq), None, text, lang, 0)
        for (seq, op, url, lang, text) in rows
    ]
    return spark.createDataFrame(data, WAL_SCHEMA_V1)


def test_changes_classification_and_carried_rows(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=4)
    # 4 buckets + many urls => every bucket holds multiple urls, so the
    # COW rewrite of epoch 1 CARRIES untouched urls — they must not leak
    # into the feed.
    lake.merge(spark, _batch(spark, [
        (i, "upsert", f"u/{i}", "en", f"t{i}") for i in range(16)
    ]), epoch_id=0)
    lake.merge(spark, _batch(spark, [
        (100, "upsert", "u/3", "fi", "updated"),
        (101, "delete", "u/7", None, None),
        (102, "upsert", "u/new", "sv", "fresh"),
    ]), epoch_id=1)
    feed = {r["url"]: r for r in lake.changes(spark, 1, 2).collect()}
    assert set(feed) == {"u/3", "u/7", "u/new"}
    assert feed["u/3"]["change_type"] == "update"
    assert (feed["u/3"]["before_text"], feed["u/3"]["after_text"]) == ("t3", "updated")
    assert feed["u/3"]["before_lang"] == "en" and feed["u/3"]["after_lang"] == "fi"
    assert feed["u/7"]["change_type"] == "delete" and feed["u/7"]["after_text"] is None
    assert feed["u/new"]["change_type"] == "insert"
    assert feed["u/new"]["seq_before"] is None and feed["u/new"]["seq_after"] == 102


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changes_fold_reproduces_state(spark, tmp_path, wal_evolving, mode):
    """scan(v0) + changes(v0 -> head) folded == scan(head): the feed is a
    complete and minimal delta, across updates/deletes/schema change and
    (MoR) delta files + compaction commits."""
    from cdc_engine.config import CdcConfig
    from cdc_engine.runner import replay

    wal_dir, cfg, _ = wal_evolving
    lake = SnapLake.create(str(tmp_path / f"l_{mode}"), PAGES_SCHEMA_V1, n_buckets=16, mode=mode)
    replay(spark, lake, wal_dir, CdcConfig(events_per_epoch=cfg.events_per_epoch))
    head = lake.head_version()
    v0 = 1

    user_cols = [f.name for f in lake.schema().fields]
    old = lake.scan(spark, version=v0)
    for f in lake.schema().fields:  # conform pre-evolution snapshot
        if f.name not in old.columns:
            old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
    old = old.select(*user_cols)

    feed = lake.changes(spark, v0, head)
    touched_urls = feed.select("url")
    survivors = old.join(touched_urls, "url", "left_anti")
    after = feed.where(F.col("change_type") != "delete").select(
        "url", *[F.col(f"after_{c}").alias(c) for c in user_cols if c != "url"]
    ).select(*user_cols)
    folded = survivors.unionByName(after)

    expect = sorted(map(tuple, lake.scan(spark, version=head).select(*user_cols).collect()))
    got = sorted(map(tuple, folded.collect()))
    assert got == expect


def test_changes_empty_for_compaction_only_commit(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), PAGES_SCHEMA_V1, n_buckets=4, mode="mor")
    for e in range(6):
        lake.merge(spark, _batch(spark, [
            (10 * e + i, "upsert", f"u/{i}", "en", f"t{e}.{i}") for i in range(8)
        ]), epoch_id=e)
    v_before = lake.head_version()
    lake.compact(spark, list(range(4)))
    v_after = lake.head_version()
    assert v_after == v_before + 1
    assert lake.changes(spark, v_before, v_after).count() == 0


def test_point_lookup_is_bucket_bounded_and_lww_correct(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "lk"), PAGES_SCHEMA_V1, n_buckets=32, mode="mor")
    lake.merge(spark, _batch(spark, [
        (i, "upsert", f"u/{i}", "en", f"t{i}") for i in range(64)
    ]), epoch_id=0)
    lake.merge(spark, _batch(spark, [
        (100, "upsert", "u/5", "fi", "updated"),
        (101, "delete", "u/6", None, None),
    ]), epoch_id=1)

    got = {r["url"]: r for r in lake.lookup(spark, ["u/5", "u/6", "u/7", "u/none"]).collect()}
    assert set(got) == {"u/5", "u/7"}          # delete and miss excluded
    assert got["u/5"]["text"] == "updated"      # MoR collapse picked the delta
    assert got["u/7"]["text"] == "t7"

    # time travel: before epoch 1 the old value and the deleted row are back
    old = {r["url"]: r for r in lake.lookup(spark, ["u/5", "u/6"], version=1).collect()}
    assert old["u/5"]["text"] == "t5" and old["u/6"]["text"] == "t6"


def test_changes_from_genesis_is_all_inserts(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "g"), PAGES_SCHEMA_V1, n_buckets=4)
    lake.merge(spark, _batch(spark, [
        (1, "upsert", "u/a", "en", "x"),
        (2, "delete", "u/gone", None, None),  # delete of a never-seen url
        (3, "upsert", "u/b", "fi", "y"),
    ]), epoch_id=0)
    feed = {r["url"]: r for r in lake.changes(spark, 0).collect()}
    assert set(feed) == {"u/a", "u/b"}  # the no-op tombstone emits nothing
    assert all(r["change_type"] == "insert" for r in feed.values())
    assert all(r["seq_before"] is None for r in feed.values())
