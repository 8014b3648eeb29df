"""SCD Type-2 history semantics: validity intervals tile each key's
timeline, the current row agrees with the LWW winner, and tombstones
close a key's history (no current row)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cdc_engine.dedup import lww_dedup
from cdc_engine.scd import scd2_history


def _changes(spark):
    rows = [
        # key "a": upsert, upsert (out-of-order arrival), update
        ("a", datetime(2026, 1, 1, 0, 0, 2), 3, "upsert"),
        ("a", datetime(2026, 1, 1, 0, 0, 1), 2, "upsert"),
        ("a", datetime(2026, 1, 1, 0, 0, 3), 5, "upsert"),
        # key "b": ts tie broken by seq; later tombstone closes history
        ("b", datetime(2026, 1, 1, 0, 0, 1), 1, "upsert"),
        ("b", datetime(2026, 1, 1, 0, 0, 1), 4, "upsert"),
        ("b", datetime(2026, 1, 1, 0, 0, 9), 6, "delete"),
    ]
    return spark.createDataFrame(rows, "url string, ts timestamp, seq long, op string")


def test_versions_tile_the_timeline(spark):
    out = scd2_history(_changes(spark)).orderBy("url", "version_n").collect()
    a = [r for r in out if r["url"] == "a"]
    assert [r["version_n"] for r in a] == [1, 2, 3]
    # effective_to of version n == ts of version n+1 (half-open tiling)
    for prev, nxt in zip(a, a[1:]):
        assert prev["effective_to"] == nxt["ts"]
    assert a[-1]["effective_to"] is None and a[-1]["is_current"]


def test_tie_breaks_by_seq_and_matches_lww(spark):
    ch = _changes(spark)
    out = scd2_history(ch)
    b = out.where("url = 'b'").orderBy("version_n").collect()
    # seq 1 then seq 4 at the tied ts, tombstone last
    assert [r["seq"] for r in b] == [1, 4, 6]
    # tombstone closes the key: open interval but NOT current
    assert b[-1]["effective_to"] is None and not b[-1]["is_current"]
    # exactly the LWW winner is the open version for every key
    cur = {
        r["url"]: r["seq"] for r in out.where("is_current").collect()
    }
    lww = {
        r["url"]: r["seq"]
        for r in lww_dedup(ch, key="url", ts="ts", seq="seq")
        .where(F.col("op") != "delete")
        .collect()
    }
    assert cur == lww


def test_single_keyed_exchange(spark):
    """Scale shape: the whole SCD2 assembly is ONE hash partitioning on
    the key — no extra shuffle beyond the LWW-style exchange."""
    plan = scd2_history(_changes(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(url") <= 1
    assert "SortMergeJoin" not in plan and "PythonUDF" not in plan
