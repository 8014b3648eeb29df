"""IcebergLake is the real-cluster backend; this sandbox has no Iceberg
jars (SURVEY.md §7.1), so the RUNTIME is guarded — but all SQL
construction, the wap-id codec, and schema-evolution ALTER planning are
pure functions golden-tested here, leaving only the Iceberg runtime
itself unverified. The full merge-semantics tests execute on a cluster
where iceberg_available() is true."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from cdc_engine.iceberg import (
    IcebergLake,
    cherrypick_sql,
    committed_epochs_sql,
    create_table_sql,
    iceberg_available,
    merge_sql,
    plan_schema_evolution,
    rewrite_data_files_sql,
    staged_snapshot_sql,
    wap_id,
)


def _norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


def test_importable_and_interface_parity():
    # the subset of the SnapLake interface the engine drives
    for meth in ("create", "merge", "scan", "committed_epochs", "compact"):
        assert hasattr(IcebergLake, meth)


def test_wap_id_round_trip():
    """The atomic-ledger key: wap.id encodes (epoch, commit) and must parse
    back exactly — including commit ids that themselves contain dashes —
    while foreign wap ids (other writers sharing the table) are ignored."""
    for epoch, commit in ((0, "cafe"), (42, "c-with-dashes-123"), (10**9, "x")):
        wap = IcebergLake._wap_id(epoch, commit)
        assert IcebergLake._parse_wap(wap) == (epoch, commit)
    assert IcebergLake._parse_wap(None) is None
    assert IcebergLake._parse_wap("") is None
    assert IcebergLake._parse_wap("someone-elses-wap") is None
    assert IcebergLake._parse_wap("epoch-notanint-x") is None


def test_create_table_sql_shape():
    sql = _norm(create_table_sql("lake.db.pages", 4096, "mor"))
    assert "PARTITIONED BY (bucket(4096, url))" in sql
    assert "'write.merge.mode' = 'merge-on-read'" in sql
    assert "'write.wap.enabled' = 'true'" in sql
    assert "'format-version' = '2'" in sql
    assert "_seq BIGINT" in sql and "_deleted BOOLEAN" in sql
    cow = _norm(create_table_sql("lake.db.pages", 16, "cow"))
    assert "'write.merge.mode' = 'copy-on-write'" in cow
    with pytest.raises(ValueError):
        create_table_sql("t", 8, "nope")


def test_merge_sql_lww_and_tombstones():
    """The MERGE must encode exactly SnapLake's semantics: strictly-fresher
    (warc_ts, seq) updates, tombstone deletes (never physical drops), and
    every user column in both branches."""
    cols = ["url", "warc_ts", "html", "text", "lang", "fetch_status"]
    sql = _norm(merge_sql("lake.db.pages", cols))
    assert "ON t.url = s.url" in sql
    assert (
        "WHEN MATCHED AND (s.warc_ts > t.warc_ts "
        "OR (s.warc_ts = t.warc_ts AND s.seq > t._seq))" in sql
    )
    for c in cols:
        assert f"t.{c} = s.{c}" in sql
    assert "t._deleted = (s.op = 'delete')" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    # tombstone semantics: no WHEN MATCHED ... DELETE branch anywhere
    assert "THEN DELETE" not in sql
    assert sql.count("s.op = 'delete'") == 2  # update set + insert values


def test_plan_schema_evolution_alters():
    cur = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("_seq", T.LongType()),
            T.StructField("_deleted", T.BooleanType()),
        ]
    )
    batch = T.StructType(
        [
            T.StructField("seq", T.LongType()),       # WAL meta: ignored
            T.StructField("op", T.StringType()),      # WAL meta: ignored
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("n", T.LongType()),          # widened int->long
            T.StructField("fetch_status", T.IntegerType()),  # added
        ]
    )
    alters, user_cols = plan_schema_evolution(cur, batch, "lake.db.pages")
    assert alters == [
        "ALTER TABLE lake.db.pages ALTER COLUMN n TYPE bigint",
        "ALTER TABLE lake.db.pages ADD COLUMN fetch_status int",
    ]
    assert user_cols == ["url", "warc_ts", "n", "fetch_status"]
    # already-evolved table + narrower batch => no ALTERs
    noop, _ = plan_schema_evolution(
        T.StructType(
            [f for f in cur.fields if not f.name.startswith("_")]
            + [
                T.StructField("fetch_status", T.IntegerType()),
                T.StructField("_seq", T.LongType()),
            ]
        ),
        T.StructType([f for f in batch.fields if f.name != "n"]),
        "t",
    )
    assert noop == []


def test_wap_ledger_sqls():
    wap = wap_id(7, "cafe")
    s = _norm(staged_snapshot_sql("lake.db.pages", wap))
    assert "LEFT ANTI JOIN lake.db.pages.history" in s
    assert f"s.summary['wap.id'] = '{wap}'" in s
    c = _norm(committed_epochs_sql("lake.db.pages"))
    assert "JOIN lake.db.pages.history h ON s.snapshot_id = h.snapshot_id" in c
    assert "WHERE h.is_current_ancestor" in c
    assert cherrypick_sql("lake.db.pages", 123) == (
        "CALL lake.system.cherrypick_snapshot("
        "table => 'lake.db.pages', snapshot_id => 123)"
    )
    assert rewrite_data_files_sql("lake.db.pages") == (
        "CALL lake.system.rewrite_data_files(table => 'lake.db.pages')"
    )


def test_skipped_without_catalog(spark):
    if iceberg_available(spark):  # pragma: no cover - real cluster only
        lake = IcebergLake.create(spark, "lake.db.pages_test", n_buckets=8)
        assert lake.committed_epochs() == {}
    else:
        pytest.skip("no Iceberg catalog in sandbox (expected)")
