"""O(1) metadata plane (round-2 verdict finding #1): the manifest must NOT
re-serialize the full cumulative ledger / file list every commit — at the
spec's 10^5-10^6 epochs that O(epochs^2) driver-side JSON rewrite becomes
the ingest bottleneck long before the data plane does.

This simulates 10k commits driving the REAL metadata bookkeeping
(SnapLake._advance_ledger / _advance_file_groups / _write_manifest — the
exact calls merge() makes) without Spark, and asserts:
  * manifest bytes per commit are bounded (late commits no bigger than
    early ones once the inline window fills);
  * the inline ledger never exceeds LEDGER_INLINE_MAX;
  * the ledger index holds O(log n) segments (log-structured merge);
  * every committed epoch is still found by ledger_entry (inline hit or
    one range-indexed segment read) and absent epochs return None;
  * committed_epochs() reconstructs the full ledger from the spill chain;
  * the file list resolves correctly from the bucket-group shards and a
    commit rewrites only the touched buckets' groups.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from cdc_engine.lake import (
    FILE_GROUPS_MAX,
    LEDGER_INLINE_MAX,
    SnapLake,
    _SideBundle,
)

SCHEMA = T.StructType([T.StructField("url", T.StringType(), False)])

N_EPOCHS = 10_000
N_BUCKETS = 256


def _fake_files(epoch: int) -> tuple[list[int], list[dict]]:
    """One commit's synthetic output: one file replacing one rotating
    bucket's contents (COW shape keeps total file count bounded)."""
    b = epoch % N_BUCKETS
    return [b], [
        {
            "path": f"data/c{epoch:08d}/_bucket={b}/part-0.parquet",
            "bucket": b,
            "rows": 100,
            "bytes": 1000,
            "ts_min": "2023-11-14T22:13:20",
            "ts_max": "2023-11-14T23:13:20",
        }
    ]


def _commit_metadata(lake: SnapLake, epoch: int) -> int:
    """Mirror of merge()'s metadata commit; returns manifest size in bytes."""
    import os as _os

    man = lake.manifest()
    version = man["version"] + 1
    commit_id = f"c{epoch:08d}"
    touched, new_files = _fake_files(epoch)
    bundle = _SideBundle(
        _os.path.join("metadata", f"commit-{man['table_uuid'][:8]}-{commit_id}.json")
    )
    file_groups = lake._advance_file_groups(
        man, commit_id, set(touched), new_files, bundle
    )
    entry = {
        "commit_id": commit_id,
        "epoch_id": epoch,
        "first_seq": epoch * 100,
        "last_seq": epoch * 100 + 99,
        "committed_at": "2023-11-14T22:13:20+00:00",
        "snapshot_id": f"v{version:08d}",
    }
    inline, spill = lake._advance_ledger(man, epoch, entry, bundle)
    if bundle.members:
        lake._write_side_json(bundle.rel_path, bundle.members)
    lake._write_manifest(
        {
            "version": version,
            "table_uuid": man["table_uuid"],
            "schema": man["schema"],
            "n_buckets": man["n_buckets"],
            "mode": man["mode"],
            "file_groups": file_groups,
            "parent": man["version"],
            "summary": {"commit_id": commit_id, "epoch_id": epoch},
            "ledger": inline,
            "ledger_spill": spill,
            "lineage": [],
        }
    )
    return os.path.getsize(lake._manifest_path(version))


def test_manifest_bytes_per_commit_bounded(tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake"), SCHEMA, n_buckets=N_BUCKETS)
    sizes = [_commit_metadata(lake, e) for e in range(N_EPOCHS)]

    # O(1) manifest: once the inline window + all bucket groups exist
    # (warm-up), late manifests are no bigger than early ones — up to the
    # few % that integer DIGIT WIDTH adds (epoch/seq literals grow from 3
    # to 7 chars), which is O(log n) text, not O(n) structure. An unbounded
    # inline ledger would be ~1.5 MB here; assert we stay 2 orders under.
    warm = max(sizes[: 2 * LEDGER_INLINE_MAX + N_BUCKETS])
    late = max(sizes[-500:])
    assert late <= warm * 1.05, f"manifest grew: warm-max={warm}B late-max={late}B"
    assert late < 32_768, f"manifest not O(1): {late}B at {N_EPOCHS} epochs"

    man = lake.manifest()
    assert len(man["ledger"]) <= LEDGER_INLINE_MAX
    assert man["ledger_spill"]["n_spilled"] + len(man["ledger"]) == N_EPOCHS

    # log-structured index: segment count is O(log n), not n/chunk
    index = lake._resolve_ref(man["ledger_spill"]["index"])
    assert len(index["segments"]) <= 24, len(index["segments"])
    assert len(json.dumps(index)) < 8192

    # every epoch still looked up exactly; absent ids miss cleanly
    for e in (0, 1, 31, 32, 63, 64, 1000, N_EPOCHS // 2, N_EPOCHS - 1):
        hit = lake.ledger_entry(e)
        assert hit is not None and hit["epoch_id"] == e, e
    assert lake.ledger_entry(N_EPOCHS) is None
    assert lake.ledger_entry(10**9) is None

    # the full ledger is reconstructable from the spill chain
    all_epochs = lake.committed_epochs()
    assert len(all_epochs) == N_EPOCHS
    assert all_epochs[0]["commit_id"] == "c00000000"
    assert all_epochs[N_EPOCHS - 1]["epoch_id"] == N_EPOCHS - 1

    # file list: one live file per bucket (each commit replaced one bucket)
    files = lake._files(man)
    assert len(files) == N_BUCKETS
    assert {f["bucket"] for f in files} == set(range(N_BUCKETS))
    # bucket-pruned metadata read resolves only the needed group
    sub = lake._files(man, buckets={3})
    assert [f["bucket"] for f in sub] == [3]


def test_commit_touches_only_its_buckets_groups(tmp_path):
    lake = SnapLake.create(str(tmp_path / "lake2"), SCHEMA, n_buckets=N_BUCKETS)
    for e in range(N_BUCKETS):  # populate every group
        _commit_metadata(lake, e)
    before = dict(lake.manifest()["file_groups"]["groups"])
    _commit_metadata(lake, N_BUCKETS)  # touches bucket 0 only
    after = dict(lake.manifest()["file_groups"]["groups"])
    n_groups = lake.manifest()["file_groups"]["n_groups"]
    assert n_groups == min(FILE_GROUPS_MAX, N_BUCKETS)
    changed = [g for g in after if after[g] != before.get(g)]
    assert changed == [str(0 % n_groups)]


def test_spill_files_precede_manifest_reference(tmp_path):
    """Crash-safety ordering: every side file referenced by HEAD's manifest
    exists (they are written+fsynced first); the HEAD swap is the single
    commit point."""
    lake = SnapLake.create(str(tmp_path / "lake3"), SCHEMA, n_buckets=8)
    for e in range(300):
        _commit_metadata(lake, e)
    man = lake.manifest()
    idx_ref = man["ledger_spill"]["index"]
    refs = [lake._ref_path(idx_ref)]
    index = lake._resolve_ref(idx_ref)
    refs += [lake._ref_path(s["ref"]) for s in index["segments"]]
    refs += [lake._ref_path(g["ref"]) for g in man["file_groups"]["groups"].values()]
    for rel in refs:
        assert os.path.isfile(os.path.join(lake.path, rel)), rel
    # and the spilled segments partition the committed epoch space exactly
    spilled = sum(s["n"] for s in index["segments"])
    assert spilled == man["ledger_spill"]["n_spilled"]
    assert json.dumps(man)  # manifest itself stays valid JSON-serializable
