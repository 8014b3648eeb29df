"""Per-file key blooms: lookup prunes bucket-granular -> file-granular.

The table property ``key_blooms=True`` attaches a url bloom to every
written file's manifest entry; ``lookup`` keeps only the files whose
bloom may hold a queried key. Pruning must never change results (no
false negatives), must actually drop files on multi-epoch MoR tables,
and must be a no-op on tables without blooms (default off — the benched
ingest path is byte-unchanged).
"""

from __future__ import annotations

import datetime as dt

import pytest

from cdc_engine.lake import (
    SnapLake,
    _kbloom_build,
    _kbloom_may_contain,
    _kbloom_prune,
)
from cdc_engine.schemas import PAGES_SCHEMA_V1, WAL_SCHEMA_V1

TS = dt.datetime(2025, 1, 1)


def _batch(spark, rows):
    data = [
        (seq, op, url, TS + dt.timedelta(seconds=seq), None, text, lang, 0)
        for (seq, op, url, lang, text) in rows
    ]
    return spark.createDataFrame(data, WAL_SCHEMA_V1)


def test_kbloom_unit_no_false_negatives_and_low_fpp():
    keys = [f"https://e{i}.example/p{i}" for i in range(2000)]
    kb = _kbloom_build(keys)
    entry = {"path": "x", "kbloom": kb}
    cache: dict = {}
    assert all(_kbloom_may_contain(entry, k, cache) for k in keys)
    absent = [f"https://absent{i}.example/q" for i in range(2000)]
    fp = sum(_kbloom_may_contain(entry, k, cache) for k in absent)
    assert fp / len(absent) < 0.03  # 10 bits/key, k=7 => ~0.8% design fpp

    # entries without a bloom are never pruned
    assert _kbloom_may_contain({"path": "y"}, "anything")
    assert _kbloom_prune([{"path": "y"}], ["zzz"]) == [{"path": "y"}]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_lookup_bloom_pruned_matches_unpruned(spark, tmp_path, mode):
    lake = SnapLake.create(
        str(tmp_path / mode), PAGES_SCHEMA_V1, n_buckets=4, mode=mode,
        key_blooms=True,
    )
    # 3 epochs with disjoint url sets => each bucket accumulates files
    # (MoR deltas / COW rewrites) where a given key is in at most one
    # source file per epoch-set
    for e in range(3):
        lake.merge(
            spark,
            _batch(spark, [
                (100 * e + i, "upsert", f"u/e{e}/{i}", "en", f"t{e}.{i}")
                for i in range(24)
            ]),
            epoch_id=e,
        )
    lake.merge(spark, _batch(spark, [
        (900, "upsert", "u/e1/5", "fi", "updated"),
        (901, "delete", "u/e0/7", None, None),
    ]), epoch_id=3)

    man = lake.manifest()
    files = lake._files(man)
    assert all(f.get("kbloom") for f in files), "every written file carries a bloom"

    urls = ["u/e1/5", "u/e0/7", "u/e2/11", "u/never/seen"]
    got = {r["url"]: r for r in lake.lookup(spark, urls).collect()}
    assert set(got) == {"u/e1/5", "u/e2/11"}  # deleted + absent drop out
    assert got["u/e1/5"]["text"] == "updated" and got["u/e1/5"]["lang"] == "fi"
    assert got["u/e2/11"]["text"] == "t2.11"

    # the prune provably drops files: a single later-epoch key keeps fewer
    # files than its bucket holds
    kept = _kbloom_prune(files, ["u/e2/11"])
    assert 0 < len(kept) < len(files)
    # an absent key prunes (near-)everything — allow bloom fp slack
    assert len(_kbloom_prune(files, ["u/never/seen"])) <= max(1, len(files) // 4)


def test_lookup_without_blooms_unchanged(spark, tmp_path):
    lake = SnapLake.create(str(tmp_path / "plain"), PAGES_SCHEMA_V1, n_buckets=4)
    lake.merge(spark, _batch(spark, [
        (i, "upsert", f"u/{i}", "en", f"t{i}") for i in range(8)
    ]), epoch_id=0)
    files = lake._files(lake.manifest())
    assert not any(f.get("kbloom") for f in files)  # default stays bloom-free
    assert _kbloom_prune(files, ["u/3"]) == files  # no-bloom entries all kept
    got = {r["url"]: r["text"] for r in lake.lookup(spark, ["u/3", "u/9"]).collect()}
    assert got == {"u/3": "t3"}
