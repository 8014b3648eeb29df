"""SnapLake: a from-scratch snapshot-versioned lake table (SURVEY.md §7.2).

The spec targets Iceberg (BASELINE.json:14), but the sandbox has no Iceberg
jars and no network, so SnapLake implements exactly the Iceberg semantics
the engine needs, in pure PySpark + JSON manifests:

  table_root/
    data/<commit_id>/_bucket=K/part-*.parquet   immutable data files
    metadata/v00000007.json                     immutable snapshot manifest
    metadata/HEAD                               atomic pointer (os.rename)

* **Bucketed layout**: every data file belongs to one bucket
  ``pmod(xxhash64(url), n_buckets)`` (Iceberg ``bucket(N, url)`` partition
  transform analog). MERGE rewrites only the buckets the batch touches —
  at 100 TB with n_buckets=4096 an epoch touching 1% of url-space rewrites
  ~1% of the table, not all of it.
* **Copy-on-write MERGE**: full-outer join of touched-bucket state with the
  (already LWW-deduped) batch on ``url``; winner = max (warc_ts, seq);
  deletes persist as tombstone rows (``_deleted``) so an out-of-order
  insert arriving in a LATER epoch with an OLDER warc_ts still loses —
  physical row drop would silently resurrect it (SURVEY.md §7.4.1).
* **Atomic snapshot commit**: write immutable manifest vN+1, then swap
  ``HEAD`` via ``os.rename`` (POSIX-atomic). The offset ledger entry and
  the epoch's per-partition lineage rows live INSIDE the manifest, so data,
  ledger and lineage commit in one atomic step — the exactly-once
  cornerstone (SURVEY.md §7.4.2).
* **O(1) manifest bytes per commit** (the 10^10-event metadata plane):
  a naive manifest would re-serialize the FULL cumulative ledger and file
  list every epoch — O(epochs^2) total driver bytes, the ingest bottleneck
  at 10^5+ epochs. Instead (Iceberg manifest-list analog):
    - the manifest inlines only the newest ``LEDGER_INLINE_MAX`` ledger
      entries; older entries spill to immutable 32-entry JSON segments
      (``metadata/ledger-seg-*.json``) tracked by a tiny index file that is
      rewritten only when a segment spills (amortized ~1 index entry per
      commit). Idempotence lookups hit the inline window first and fall
      back to one segment read (range-indexed) on deep replays.
    - the file list is sharded into ``<= FILE_GROUPS_MAX`` bucket-group
      manifest files (``metadata/files-v*-g*.json``, immutable); a commit
      rewrites only the groups containing touched buckets and carries the
      untouched groups' refs forward. Bucket-pruned scans load only the
      groups they need, so metadata reads prune with the data.
  All side files are fsynced BEFORE the manifest referencing them, and the
  HEAD swap stays the single atomic commit point; crash retries rewrite
  side files byte-identically (deterministic names + contents).
* **Idempotence**: ``merge`` consults the accumulated ledger first; a
  re-delivered epoch (foreachBatch retry / replay overlap) is a no-op.
  The LWW merge condition is the semantic backstop: even a forced re-apply
  cannot change the final state.
* **Schema evolution**: manifests pin the table schema; MERGE widens it via
  ``normalize.evolve_schema`` when a batch carries new/wider columns. Old
  data files are NOT rewritten — Spark 4's parquet reader fills missing
  columns with NULL and widens int->long under an explicit read schema
  (verified), the Iceberg schema-evolution read path analog.
* **Time travel**: ``scan(spark, version=K)`` reads any retained snapshot.

A real-cluster ``IcebergLake`` with the same interface belongs next to this
class (MERGE INTO + snapshot summary properties); it is not included here
because it cannot run or be tested in this sandbox (SURVEY.md §7.2).

Reference parity note: upstream cfe_39 persisted progress by encoding the
last Kafka offset in the HDFS filename it renamed into place (SURVEY.md
§3.4 [UPSTREAM]); SnapLake keeps that shape — durable atomic rename carrying
the offset range — and generalizes it to CDC snapshots.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid
from datetime import datetime, timezone
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cdc_engine.normalize import conform, evolve_schema
from cdc_engine.salt import bucket_expr
from cdc_engine.schemas import INTERNAL_DELETED, INTERNAL_SEQ, WAL_META_COLS
from cdc_engine.timing import phase

# O(1)-metadata knobs (module docstring): inline ledger window, spill chunk,
# and the bucket-group shard count for the file list. Small values keep the
# per-commit manifest a few KB regardless of table age; lookups stay O(1).
LEDGER_INLINE_MAX = 64
LEDGER_SPILL_CHUNK = 32
FILE_GROUPS_MAX = 64
# Adaptive write fanout (the Iceberg fanout-writer problem): a small epoch
# on a many-bucket table must not write one tiny file per bucket. When the
# epoch's row count is small, data files are written per bucket CLASS
# (residue mod ft, ft a multiple of the metadata group count) instead of
# per bucket, so file count tracks data size, not bucket count; entries
# carry "bmod" = ft and cover every bucket congruent to their residue.
# A plain entry (no bmod) covers exactly its one bucket (bmod=n_buckets).
TARGET_ROWS_PER_FILE = 100_000


def _entry_covers(f: dict, n_buckets: int, buckets) -> bool:
    """Does file entry ``f`` (possibly a bucket-class file) cover any of
    ``buckets``? Conservative by design: a class file may hold rows for
    only some of its declared residue class — selection then reads a few
    extra small files, never misses one."""
    m = f.get("bmod", n_buckets)
    r = f["bucket"] % m
    return any(b % m == r for b in buckets)


def _load_side_json(path: str):
    """Read-cache for immutable metadata side files (per-commit bundles,
    plus any standalone legacy files). Safe to cache: side files are
    content-deterministic, written via fsync+rename BEFORE the manifest
    referencing them, and their names embed the table uuid + commit id, so
    a re-created table at the same path can never alias a stale cache
    entry."""
    return _load_side_json_cached(path)


class _SideBundle:
    """ONE metadata side file per commit, holding every member this commit
    produced (file-group lists, spilled ledger segments, the ledger index).
    Writing one bundle instead of N standalone files keeps the commit at a
    constant number of fsyncs/objects regardless of touched-group count —
    on ext4 that is ~1 content fsync instead of up to 64, and on an object
    store one PUT instead of dozens (the Iceberg manifest-list shape)."""

    def __init__(self, rel_path: str):
        self.rel_path = rel_path
        self.members: dict[str, Any] = {}

    def add(self, member: str, obj) -> dict:
        """Store ``obj`` under ``member``; returns the manifest ref."""
        self.members[member] = obj
        return {"path": self.rel_path, "member": member}


def _lru(fn):
    from functools import lru_cache

    return lru_cache(maxsize=512)(fn)


@_lru
def _load_side_json_cached(path: str):
    with open(path) as f:
        return json.load(f)


_LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("commit_id", T.StringType(), False),
        T.StructField("first_seq", T.LongType(), True),
        T.StructField("last_seq", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("first_seq", T.LongType(), True),
        T.StructField("last_seq", T.LongType(), True),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_upserted", T.LongType(), True),
        T.StructField("rows_deleted", T.LongType(), True),
        T.StructField("rows_late_ignored", T.LongType(), True),
        T.StructField("rows_quarantined", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("apply_latency_ms", T.DoubleType(), True),
    ]
)


def _cow_broadcast_plan(tgt, src):
    """Broadcast CDC-apply join shape (COW merge, small-epoch common case):
    one (t, s) struct-columned relation row-equivalent to
    ``tgt FULL OUTER JOIN src ON url`` — but the wide target never enters
    a join exchange. Updates/carries: target LEFT JOIN broadcast(batch),
    map-side. Inserts: batch ANTI JOIN a column-pruned url-only target
    scan (narrow). A NULL t struct stands in for the outer join's
    null-extended target side, so every downstream expression (winner
    predicate, per-column pick, lineage Observation) runs verbatim on
    either shape via t.col / s.col struct-field access. Requires both
    sides unique per url (target invariant + LWW dedup), which also holds
    for the full-outer path."""
    t_struct = F.struct(*[F.col(f"t.`{c}`") for c in tgt.columns]).alias("t")
    s_struct = F.struct(*[F.col(f"s.`{c}`") for c in src.columns]).alias("s")
    upd = (
        tgt.alias("t")
        .join(
            F.broadcast(src).alias("s"),
            F.col("t.url") == F.col("s.url"),
            "left_outer",
        )
        .select(t_struct, s_struct)
    )
    ins = (
        src.alias("s")
        .join(
            tgt.select(F.col("url").alias("__t_url")),
            F.col("s.url") == F.col("__t_url"),
            "left_anti",
        )
        .select(
            F.lit(None).cast(upd.schema["t"].dataType).alias("t"),
            s_struct,
        )
    )
    return upd.unionByName(ins)


def _internal_schema(user: T.StructType) -> T.StructType:
    return T.StructType(
        list(user.fields)
        + [
            T.StructField(INTERNAL_SEQ, T.LongType(), False),
            T.StructField(INTERNAL_DELETED, T.BooleanType(), False),
        ]
    )


class SnapLake:
    """Snapshot-versioned bucketed lake table (see module docstring)."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.meta_dir = os.path.join(self.path, "metadata")
        self.data_dir = os.path.join(self.path, "data")

    # ------------------------------------------------------------- create
    @staticmethod
    def create(
        path: str,
        schema: T.StructType,
        n_buckets: int = 16,
        mode: str = "cow",
        key_blooms: bool = False,
    ) -> "SnapLake":
        """``mode``: 'cow' (copy-on-write — MERGE rewrites touched buckets;
        cheap scans, read-heavy workloads) or 'mor' (merge-on-read — MERGE
        appends LWW-ready delta files with NO target read/join; scans
        collapse base+delta per url; compaction folds deltas back into base.
        The ingest-throughput mode, Iceberg write.merge.mode analog).

        ``key_blooms``: table property — every written file gets a per-file
        url bloom in its manifest entry so ``lookup`` prunes to the files
        that may hold each key (point reads go bucket-granular ->
        file-granular). Off by default: building blooms reads the url
        column of every written file, a write-path cost read-heavy tables
        buy deliberately (Iceberg write.parquet.bloom-filter-enabled
        analog, lifted to the manifest so pruning needs no file opens)."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown table mode: {mode}")
        lake = SnapLake(path)
        os.makedirs(lake.meta_dir, exist_ok=False)
        os.makedirs(lake.data_dir, exist_ok=True)
        manifest = {
            "version": 0,
            "table_uuid": uuid.uuid4().hex,
            "schema": schema.jsonValue(),
            "n_buckets": n_buckets,
            "mode": mode,
            "key_blooms": key_blooms,
            # sharded file list: groups map str(bucket % n_groups) -> side-
            # file ref; absent key == empty group (genesis writes no files)
            "file_groups": {"n_groups": min(FILE_GROUPS_MAX, n_buckets), "groups": {}},
            "parent": None,
            "summary": {"commit_id": "genesis", "epoch_id": None},
            "ledger": {},
            "ledger_spill": {"index": None, "max_epoch": None, "n_spilled": 0},
            "lineage": [],
        }
        lake._write_manifest(manifest)
        return lake

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.isfile(os.path.join(path, "metadata", "HEAD"))

    # ----------------------------------------------------------- metadata
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:08d}.json")

    def head_version(self) -> int:
        with open(os.path.join(self.meta_dir, "HEAD")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | str | None = None) -> dict[str, Any]:
        """``version``: an int, None (head), or a TAG NAME — every
        versioned read surface (scan/lookup/changes/schema) accepts tags
        through here."""
        v = self.head_version() if version is None else self._resolve_version(version)
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    # ------------------------------------------------------ tags / rollback
    def _tags_path(self) -> str:
        return os.path.join(self.meta_dir, "tags.json")

    def tags(self) -> dict[str, int]:
        """Named snapshot refs (Iceberg tag analog): name -> version.
        Tagged versions are protected from ``expire_snapshots`` and block
        ``rollback`` past them."""
        if not os.path.isfile(self._tags_path()):
            return {}
        with open(self._tags_path()) as f:
            return json.load(f)

    def _write_tags(self, tags: dict[str, int]) -> None:
        tmp = f"{self._tags_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(tags, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._tags_path())

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin ``name`` to ``version`` (default head). O(1) metadata."""
        v = self.head_version() if version is None else int(version)
        if not os.path.isfile(self._manifest_path(v)):
            raise FileNotFoundError(f"cannot tag missing snapshot v{v}")
        tags = self.tags()
        tags[name] = v
        self._write_tags(tags)
        return v

    def drop_tag(self, name: str) -> None:
        tags = self.tags()
        tags.pop(name, None)
        self._write_tags(tags)

    def _resolve_version(self, version: int | str) -> int:
        if isinstance(version, str):
            tags = self.tags()
            if version not in tags:
                raise KeyError(f"unknown snapshot tag: {version!r}")
            return tags[version]
        return int(version)

    def rollback(self, to_version: int | str) -> dict[str, int]:
        """Destructive snapshot rollback: HEAD returns to ``to_version``;
        the abandoned commits' manifests and EXCLUSIVELY-referenced data /
        side files are deleted. The ledger rolls back with the manifest,
        so a subsequent replay re-applies exactly the epochs committed
        after the target — the CDC undo story (bad epochs re-ingested
        cleanly, deterministic commit dirs left no debris). O(data files
        of the abandoned commits), zero Spark jobs. Refuses to cross a
        tag (drop the tag first); single-writer assumption as in merge.

        Invalidate the side-bundle LRU: that cache is sound because side
        files are immutable, and rollback is the ONE operation that breaks
        the contract — a re-applied epoch reuses its deterministic bundle
        path with new content, so a stale cached copy would resurrect the
        deleted commit's file list. The clear happens LAST — rollback's own
        referenced_paths walk re-populates the cache with the abandoned
        bundles it is about to delete."""
        tv = self._resolve_version(to_version)
        head = self.head_version()
        if tv > head:
            raise ValueError(f"rollback target v{tv} is ahead of head v{head}")
        if not os.path.isfile(self._manifest_path(tv)):
            raise FileNotFoundError(f"rollback target v{tv} expired")
        blocking = {n: v for n, v in self.tags().items() if v > tv}
        if blocking:
            raise ValueError(
                f"rollback to v{tv} would delete tagged snapshots {blocking}; "
                "drop those tags first"
            )
        if tv == head:
            return {"version": tv, "removed_manifests": 0, "removed_files": 0}
        keep: set[str] = set()
        for v in range(tv + 1):
            if os.path.isfile(self._manifest_path(v)):
                keep |= self.referenced_paths(v)
        drop: set[str] = set()
        for v in range(tv + 1, head + 1):
            if os.path.isfile(self._manifest_path(v)):
                drop |= self.referenced_paths(v)
        # atomic HEAD swap FIRST: a crash mid-cleanup leaves only orphans
        # (re-removed by the next rollback/expire vacuum), never a HEAD
        # pointing at deleted metadata
        tmp = os.path.join(self.meta_dir, f".HEAD.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            f.write(str(tv))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.meta_dir, "HEAD"))
        removed_files = 0
        for rel in sorted(drop - keep):
            ap = os.path.join(self.path, rel)
            if os.path.isfile(ap):
                os.remove(ap)
                removed_files += 1
        removed_man = 0
        for v in range(tv + 1, head + 1):
            mp = self._manifest_path(v)
            if os.path.isfile(mp):
                os.remove(mp)
                removed_man += 1
        for dirpath, dirs, names in os.walk(self.data_dir, topdown=False):
            if not dirs and not names and dirpath != self.data_dir:
                os.rmdir(dirpath)
        _load_side_json_cached.cache_clear()
        return {
            "version": tv,
            "removed_manifests": removed_man,
            "removed_files": removed_files,
        }

    def fsck(self, deep: bool = False) -> dict[str, Any]:
        """Metadata integrity audit over the retained snapshot chain —
        the operational check a 100 TB table runs after an incident
        (crash mid-expire, storage losing files, manual surgery). Pure
        driver-side metadata + stat calls, zero Spark jobs; ``deep``
        additionally opens every live parquet footer (row counts vs
        manifest, bloom decodability) — still O(files), no data read.

        errors (ok=False): broken manifest chain, unresolvable side
        refs, missing/size-mismatched referenced files, non-dense
        ledger, dangling tags. warnings (ok stays True): orphan data
        files awaiting vacuum."""
        report: dict[str, Any] = {
            "ok": True,
            "errors": [],
            "warnings": [],
            "versions_checked": 0,
            "files_checked": 0,
            "orphan_data_files": 0,
        }

        def err(msg: str) -> None:
            report["errors"].append(msg)
            report["ok"] = False

        head = self.head_version()
        if not os.path.isfile(self._manifest_path(head)):
            err(f"HEAD points at missing manifest v{head}")
            return report
        tagged = set(self.tags().values())
        existing: list[int] = []
        for n in os.listdir(self.meta_dir):
            if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit():
                existing.append(int(n[1:-5]))
        existing.sort()
        # HEAD's ancestry must be a contiguous suffix down to the expiry
        # horizon; versions surviving below a hole are fine ONLY as tag
        # pins (expire keeps them) — anything else is stranded metadata
        suffix_lo = head
        while suffix_lo - 1 in set(existing):
            suffix_lo -= 1
        versions = [v for v in existing if v <= head]
        for v in versions:
            if v < suffix_lo and v not in tagged and v > 0:
                report["warnings"].append(
                    f"stranded manifest v{v} below the retention horizon "
                    "(untagged and unreachable from HEAD's contiguous chain)"
                )
        for v in existing:
            if v > head:
                report["warnings"].append(
                    f"manifest v{v} ahead of HEAD (crash between manifest "
                    "write and HEAD swap; harmless commit debris)"
                )
        for v in versions:
            try:
                man = self.manifest(v)
            except (json.JSONDecodeError, OSError) as ex:
                err(f"v{v}: unreadable manifest: {ex}")
                continue
            if man["version"] != v:
                err(f"v{v}: manifest declares version {man['version']}")
            if v > suffix_lo and man["parent"] != v - 1 and v in range(suffix_lo, head + 1):
                err(f"v{v}: parent is {man['parent']}, expected {v - 1}")
        versions = [
            v for v in versions if os.path.isfile(self._manifest_path(v))
        ]
        report["versions_checked"] = len(versions)

        seen_files: set[str] = set()
        all_refs: set[str] = set()
        # head-first: a file carried through many manifests (MoR deltas) is
        # audited against its NEWEST entry — the one current reads resolve
        for v in sorted(versions, reverse=True):
            try:
                man = self.manifest(v)
                refs = self.referenced_paths(v)
            except (FileNotFoundError, KeyError, json.JSONDecodeError) as ex:
                err(f"v{v}: unresolvable side refs: {ex!r}")
                continue
            all_refs |= refs
            for rel in refs:
                if rel.startswith("metadata/") and not os.path.isfile(
                    os.path.join(self.path, rel)
                ):
                    err(f"v{v}: missing metadata side file {rel}")
            for f in self._files(man):
                rel = f["path"]
                if rel in seen_files:
                    continue
                seen_files.add(rel)
                report["files_checked"] += 1
                ap = os.path.join(self.path, rel)
                if not os.path.isfile(ap):
                    err(f"v{v}: missing data file {rel}")
                    continue
                if f.get("bytes") is not None and os.path.getsize(ap) != f["bytes"]:
                    err(
                        f"v{v}: size mismatch {rel}: disk "
                        f"{os.path.getsize(ap)} != manifest {f['bytes']}"
                    )
                elif deep:
                    try:
                        nrows = pq.ParquetFile(ap).metadata.num_rows
                    except Exception as ex:  # corrupt footer
                        err(f"v{v}: unreadable parquet footer {rel}: {ex}")
                        continue
                    if f.get("rows") is not None and nrows != f["rows"]:
                        err(
                            f"v{v}: row-count mismatch {rel}: footer "
                            f"{nrows} != manifest {f['rows']}"
                        )
                    if f.get("kbloom"):
                        try:
                            _kbloom_may_contain(f, "\x00fsck-probe")
                        except Exception as ex:
                            err(f"v{v}: undecodable key bloom on {rel}: {ex}")

        try:
            eps = sorted(self.committed_epochs())
            if eps and eps != list(range(eps[0], eps[-1] + 1)):
                gaps = sorted(set(range(eps[0], eps[-1] + 1)) - set(eps))
                err(f"ledger not dense: missing epochs {gaps[:10]}")
        except (FileNotFoundError, KeyError, json.JSONDecodeError) as ex:
            err(f"ledger chain unresolvable: {ex!r}")

        for name, tv in self.tags().items():
            if not os.path.isfile(self._manifest_path(tv)):
                err(f"tag {name!r} -> missing snapshot v{tv}")

        on_disk = {
            os.path.relpath(os.path.join(dp, n), self.path)
            for dp, _dirs, ns in os.walk(self.data_dir)
            for n in ns
            if n.endswith(".parquet")
        }
        orphans = on_disk - all_refs
        report["orphan_data_files"] = len(orphans)
        if orphans:
            report["warnings"].append(
                f"{len(orphans)} orphan data files (unreferenced by any "
                "retained manifest; expire_snapshots vacuum reclaims them)"
            )
        return report

    def _write_manifest(self, manifest: dict[str, Any]) -> None:
        """Immutable manifest file + atomic HEAD swap (S5).

        Power-loss ordering: (1) the metadata dir is fsynced FIRST so every
        side file this commit wrote (ledger segments/index, file groups —
        content-fsynced at write, dir entry pending) is durable before
        anything can reference it; (2) the manifest JSON is fsynced BEFORE
        the HEAD swap (otherwise a renamed HEAD could point at a truncated
        manifest after power loss); (3) the dir fd is fsynced AFTER the
        rename so the HEAD entry itself is durable."""
        dfd = os.open(self.meta_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        mp = self._manifest_path(manifest["version"])
        with open(mp, "x") as f:  # 'x': a version collision is a writer race
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = os.path.join(self.meta_dir, f".HEAD.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            f.write(str(manifest["version"]))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.meta_dir, "HEAD"))
        dfd = os.open(self.meta_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _clear_unpublished_manifest(self, version: int) -> bool:
        """Crash-debris recovery shared by merge and compact: a manifest
        file exists at ``version`` but HEAD sits below it. Either a live
        peer is in the microsecond window between its exclusive create and
        HEAD swap, or the file is UNPUBLISHED DEBRIS (crash in that window,
        or a crash mid-rollback left abandoned ahead-of-HEAD manifests). A
        live peer swaps HEAD immediately, so grant a grace period; if HEAD
        still hasn't reached ``version``, delete the debris (unpublished ==
        uncommitted) and return True. Returns False when HEAD advanced —
        a real racing peer published."""
        if self.manifest()["version"] >= version:
            return False
        time.sleep(0.1)
        if self.manifest()["version"] >= version:
            return False
        print(
            f"[cdc_engine] clearing unpublished manifest debris v{version} "
            f"(HEAD stayed at v{self.manifest()['version']} through the "
            f"grace period; crash debris, not a live commit)",
            file=sys.stderr,
        )
        try:
            os.remove(self._manifest_path(version))
        except FileNotFoundError:
            pass  # the peer's HEAD swap and our check raced
        _load_side_json_cached.cache_clear()
        return True

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def _write_side_json(self, rel: str, obj) -> None:
        """fsync'd immutable metadata side file (ledger segment/index, file
        group). Written BEFORE the manifest that references it; rename keeps
        crash-retry overwrites atomic. The DIRECTORY entry is deliberately
        NOT fsynced here: a commit may write dozens of side files and per-
        file dir fsyncs would dominate commit latency on disk-backed
        storage; _write_manifest fsyncs the metadata dir ONCE before the
        HEAD swap, making every pending side-file rename durable before the
        manifest that references them can become visible."""
        ap = os.path.join(self.path, rel)
        overwrite = os.path.exists(ap)
        tmp = f"{ap}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ap)
        if overwrite:
            # the LRU assumes side files are immutable; an overwrite (crash
            # retry, or re-applying an epoch onto rollback/crash debris at
            # its deterministic path) breaks that — drop the cache so no
            # reader resurrects the superseded content. Never taken on the
            # happy path: fresh commits use never-before-seen paths.
            _load_side_json_cached.cache_clear()

    # ------------------------------------------------------------- ledger
    def _resolve_ref(self, ref):
        """Load a metadata side object: ``{"path", "member"}`` addresses a
        member inside a per-commit bundle; a bare string is a legacy
        standalone side file."""
        if isinstance(ref, str):
            return _load_side_json(os.path.join(self.path, ref))
        return _load_side_json(os.path.join(self.path, ref["path"]))[ref["member"]]

    def _resolve_ref_pending(self, ref, bundle: _SideBundle):
        """_resolve_ref that can also see THIS commit's not-yet-written
        bundle (the log-structured segment merge may fold a segment the
        same commit just spilled)."""
        if not isinstance(ref, str) and ref["path"] == bundle.rel_path:
            return bundle.members[ref["member"]]
        return self._resolve_ref(ref)

    @staticmethod
    def _spill_index_ref(spill: dict):
        return spill.get("index") or spill.get("index_path")  # new | legacy

    def ledger_entry(
        self, epoch_id: int, man: dict | None = None
    ) -> dict | None:
        """Committed-epoch lookup (J4 idempotence): O(1) inline-window hit
        for recent epochs; deep replays fall back to the spill index and
        read only the covering 32-entry segment(s)."""
        man = self.manifest() if man is None else man
        e = man["ledger"].get(str(epoch_id))
        if e is not None:
            return e
        spill = man.get("ledger_spill") or {}
        idx_ref = self._spill_index_ref(spill)
        if not idx_ref:
            return None
        if spill.get("max_epoch") is not None and epoch_id > spill["max_epoch"]:
            return None
        index = self._resolve_ref(idx_ref)
        # ranges may overlap if epoch ids ever arrive out of order; check
        # every covering segment, newest first
        for seg in reversed(index["segments"]):
            if seg["min_epoch"] <= epoch_id <= seg["max_epoch"]:
                entries = self._resolve_ref(seg.get("ref") or seg["path"])
                hit = entries["entries"].get(str(epoch_id))
                if hit is not None:
                    return hit
        return None

    def committed_epochs(self, version: int | None = None) -> dict[int, dict]:
        """ALL committed epochs (inline + spilled). O(total epochs) — an
        ops/verification surface, never on the per-commit hot path (commits
        use ledger_entry)."""
        man = self.manifest(version)
        out: dict[int, dict] = {}
        spill = man.get("ledger_spill") or {}
        idx_ref = self._spill_index_ref(spill)
        if idx_ref:
            index = self._resolve_ref(idx_ref)
            for seg in index["segments"]:
                entries = self._resolve_ref(seg.get("ref") or seg["path"])
                out.update({int(k): v for k, v in entries["entries"].items()})
        out.update({int(k): v for k, v in man["ledger"].items()})
        return out

    def _advance_ledger(
        self, man: dict, epoch_id: int, entry: dict, bundle: _SideBundle
    ) -> tuple[dict, dict]:
        """(new inline ledger, new spill meta) after adding this epoch;
        spills the oldest LEDGER_SPILL_CHUNK inline entries to an immutable
        segment + rewrites the (tiny) index when the window overflows —
        both as members of this commit's side bundle. Spill contents are
        pure functions of the parent manifest, so a crash-retry rewrites
        them byte-identically."""
        inline = dict(man["ledger"])
        inline[str(epoch_id)] = entry
        spill = dict(
            man.get("ledger_spill")
            or {"index": None, "max_epoch": None, "n_spilled": 0}
        )
        if len(inline) <= LEDGER_INLINE_MAX:
            return inline, spill
        oldest = sorted(inline, key=int)[:LEDGER_SPILL_CHUNK]
        seg_entries = {k: inline.pop(k) for k in oldest}
        lo, hi = int(oldest[0]), int(oldest[-1])
        seg_ref = bundle.add(f"ledger-seg-{lo:012d}-{hi:012d}", {"entries": seg_entries})
        segments = []
        idx_ref = self._spill_index_ref(spill)
        if idx_ref:
            segments = list(self._resolve_ref(idx_ref)["segments"])
        segments.append(
            {"ref": seg_ref, "min_epoch": lo, "max_epoch": hi, "n": len(seg_entries)}
        )
        # log-structured segment merge: fold equal-sized neighbors so the
        # segment count — and therefore index size, index rewrite cost, and
        # worst-case lookup fan-out — stays O(log committed_epochs) instead
        # of linear (10^6 epochs => ~15 segments, not ~31k)
        while len(segments) >= 2 and segments[-1]["n"] == segments[-2]["n"]:
            a, b = segments[-2], segments[-1]
            merged = dict(
                self._resolve_ref_pending(a.get("ref") or a["path"], bundle)["entries"]
            )
            merged.update(
                self._resolve_ref_pending(b.get("ref") or b["path"], bundle)["entries"]
            )
            mlo = min(a["min_epoch"], b["min_epoch"])
            mhi = max(a["max_epoch"], b["max_epoch"])
            m_ref = bundle.add(f"ledger-seg-{mlo:012d}-{mhi:012d}", {"entries": merged})
            segments[-2:] = [
                {"ref": m_ref, "min_epoch": mlo, "max_epoch": mhi, "n": len(merged)}
            ]
        index_ref = bundle.add("ledger-index", {"segments": segments})
        max_e = hi if spill.get("max_epoch") is None else max(spill["max_epoch"], hi)
        return inline, {
            "index": index_ref,
            "max_epoch": max_e,
            "n_spilled": spill.get("n_spilled", 0) + len(seg_entries),
        }

    # --------------------------------------------------------------- scan
    def _files(self, manifest: dict, buckets: set[int] | None = None) -> list[dict]:
        if "files" in manifest:  # legacy inline file list
            fs = manifest["files"]
        else:
            fg = manifest["file_groups"]
            g_all = fg["groups"]
            if buckets is None:
                need = sorted(g_all, key=int)
            else:
                need = sorted(
                    {str(b % fg["n_groups"]) for b in buckets} & set(g_all), key=int
                )
            fs = []
            for g in need:  # metadata reads prune with the bucket filter
                fs.extend(self._resolve_ref(g_all[g].get("ref") or g_all[g]["path"]))
        if buckets is not None:
            nb = manifest["n_buckets"]
            fs = [f for f in fs if _entry_covers(f, nb, buckets)]
        return fs

    def _advance_file_groups(
        self,
        man: dict,
        commit_id: str,
        touched: set[int],
        new_files: list[dict],
        bundle: _SideBundle,
    ) -> dict:
        """New ``file_groups`` meta after a commit that REPLACES the touched
        buckets' files with ``new_files`` whose kind is 'base', or APPENDS
        delta files (kind 'delta' rides in on the entries). Only groups
        containing touched buckets get a new member in this commit's side
        bundle; every other group's ref is carried forward untouched."""
        legacy = "file_groups" not in man
        if legacy:
            n_groups = min(FILE_GROUPS_MAX, man["n_buckets"])
            groups: dict[str, dict] = {}
            old_all = man["files"]
            dirty = {f["bucket"] % n_groups for f in old_all} | {
                b % n_groups for b in touched
            }
        else:
            n_groups = man["file_groups"]["n_groups"]
            groups = dict(man["file_groups"]["groups"])
            old_all = None
            dirty = {b % n_groups for b in touched}
        appending = all(f.get("kind", "base") == "delta" for f in new_files) and new_files
        for g in sorted(dirty):
            if legacy:
                old = [f for f in old_all if f["bucket"] % n_groups == g]
            elif str(g) in groups:
                old = self._resolve_ref(
                    groups[str(g)].get("ref") or groups[str(g)]["path"]
                )
            else:
                old = []
            fresh = [f for f in new_files if f["bucket"] % n_groups == g]
            if appending:
                kept = list(old)  # MoR: append-only; compaction folds later
            else:
                # a replaced file is exactly one the merge's target read
                # selected: any file COVERING a touched bucket (class files
                # are read whole and their rows carried through the join)
                kept = [f for f in old if not _entry_covers(f, man["n_buckets"], touched)]
            new_list = sorted(kept + fresh, key=lambda f: (f["bucket"], f["path"]))
            if not new_list:
                groups.pop(str(g), None)
                continue
            groups[str(g)] = {
                "ref": bundle.add(f"files-g{g}", new_list),
                "n_files": len(new_list),
                "bytes": sum(f["bytes"] for f in new_list),
            }
        return {"n_groups": n_groups, "groups": groups}

    def scan_internal(
        self,
        spark: SparkSession,
        version: int | None = None,
        buckets: set[int] | None = None,
        files: list[dict] | None = None,
    ) -> DataFrame:
        """``files``: an explicit manifest-entry list (e.g. a time-pruned
        subset) to scan instead of resolving from the manifest — the
        file-granular pruning hook used by ``scan``."""
        man = self.manifest(version)
        schema = _internal_schema(T.StructType.fromJson(man["schema"]))
        if files is None:
            files = self._files(man, buckets)
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f["path"]) for f in files]
        # explicit schema => missing-column NULL-fill + int->long widening on
        # old files (schema evolution without rewrite)
        df = spark.read.schema(schema).parquet(*paths)
        if any(f.get("kind", "base") == "delta" for f in files):
            # merge-on-read collapse: one LWW winner per url over base+delta.
            # Window row_number, NOT max_by: the payload is wide (html bytes)
            # and max_by-over-wide-struct anti-scales with cores (agg buffers
            # copy the payload per group; measured 4.8s@8c -> 11.8s@32c on 6M
            # rows, vs 3.5s -> 2.2s for the sort-based window, which streams
            # the payload through the sorter). Same strategy the ingest-side
            # dedup defaults to (dedup.lww_dedup).
            from cdc_engine.dedup import lww_dedup

            df = lww_dedup(
                df, key="url", ts="warc_ts", seq=INTERNAL_SEQ, strategy="window"
            )
        return df

    @staticmethod
    def _cstats_disjoint(f: dict, col_bounds: dict[str, tuple]) -> bool:
        """True when the file's recorded cluster-column ranges prove it
        cannot contain a row satisfying ALL the bounds. Files without
        stats for a bounded column are conservatively kept."""
        cs = f.get("cstats") or {}
        for c, (lo, hi) in col_bounds.items():
            rng = cs.get(c)
            if rng is None:
                continue
            flo, fhi = rng
            try:
                if (hi is not None and flo > hi) or (lo is not None and fhi < lo):
                    return True
            except TypeError:
                # caller-supplied bound type incomparable with the column's
                # recorded footer-stat type (e.g. int bound on a string
                # column) — fail with the column named, not a bare
                # TypeError from deep inside the scan
                raise ValueError(
                    f"col_bounds[{c!r}]: bound types ({type(lo).__name__}, "
                    f"{type(hi).__name__}) are not comparable with the "
                    f"column's recorded stats type {type(flo).__name__}"
                ) from None
        return False

    def scan(
        self,
        spark: SparkSession,
        version: int | None = None,
        ts_min=None,
        ts_max=None,
        col_bounds: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Live rows, user columns only (tombstones filtered).

        ``ts_min``/``ts_max`` (datetime): optional warc_ts bounds.
        ``col_bounds``: {col: (lo, hi)} inclusive ranges on cluster-stat
        columns (equality = (v, v); half-open = None on one side). Row-level
        filtering always applies; additionally, whole FILES are pruned via
        the manifest's footer-stat ranges when that is LWW-safe — i.e. when
        every candidate file is a base file (each row is current state).
        With MoR delta files present, file pruning could hide a row's newer
        version, so only the row filter (post-collapse) is used."""
        man = self.manifest(version)
        files = self._files(man)
        all_base = all(f.get("kind", "base") == "base" for f in files)
        if (ts_min is not None or ts_max is not None or col_bounds) and all_base:
            from datetime import datetime as _dt

            keep = []
            for f in files:
                lo, hi = f.get("ts_min"), f.get("ts_max")
                if lo is not None and hi is not None:
                    flo, fhi = _dt.fromisoformat(lo), _dt.fromisoformat(hi)
                    if (ts_max is not None and flo > ts_max) or (
                        ts_min is not None and fhi < ts_min
                    ):
                        continue  # file provably out of range
                if col_bounds and self._cstats_disjoint(f, col_bounds):
                    continue
                keep.append(f)
            # exact file-granular pruning: a bucket with one in-range and one
            # out-of-range file reads only the in-range file
            df = self.scan_internal(spark, version, files=keep)
        else:
            df = self.scan_internal(spark, version)
        if ts_min is not None:
            df = df.where(F.col("warc_ts") >= F.lit(ts_min))
        if ts_max is not None:
            df = df.where(F.col("warc_ts") <= F.lit(ts_max))
        for c, (lo, hi) in (col_bounds or {}).items():
            if lo is not None:
                df = df.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(c) <= F.lit(hi))
        user_cols = [f.name for f in T.StructType.fromJson(man["schema"]).fields]
        return df.where(~F.col(INTERNAL_DELETED)).select(*user_cols)

    def lookup(
        self, spark: SparkSession, urls: list[str], version: int | None = None
    ) -> DataFrame:
        """Point read: current live rows for the given urls, touching ONLY
        the buckets those urls hash into — at 100 TB a k-url lookup reads
        <= k buckets' files (min(k, n_buckets)/n_buckets of the table),
        never scans. On a ``key_blooms=True`` table the read narrows
        further to the FILES whose bloom may hold a key — and unlike
        time-range pruning (scan's LWW caveat) bloom pruning is LWW-safe
        even with MoR deltas present: a file that provably does not
        contain url u cannot change u's collapse winner. The url set is
        broadcast into a semi join; MoR collapse and tombstone filtering
        apply as in ``scan``."""
        man = self.manifest(version)
        n_buckets = man["n_buckets"]
        keys = spark.createDataFrame([(u,) for u in urls], "url string")
        buckets = {
            r["_b"]
            for r in keys.select(bucket_expr("url", n_buckets).alias("_b"))
            .distinct()
            .collect()
        }
        files = self._files(man, buckets)
        files = _kbloom_prune(files, urls)
        df = self.scan_internal(spark, version, files=files)
        df = df.where(~F.col(INTERNAL_DELETED))
        user_cols = [f.name for f in T.StructType.fromJson(man["schema"]).fields]
        return df.join(F.broadcast(keys), "url", "left_semi").select(*user_cols)

    def touched_buckets_between(self, v_old: int, v_new: int) -> set[int] | None:
        """Buckets whose covering file set differs between two manifests —
        pure metadata (group refs compared before any side-file resolve;
        only changed groups resolve their lists). None = unknowable
        (legacy inline file list, or a partition-spec change between the
        versions — bucket ids are not comparable across moduli) => caller
        must treat ALL buckets as touched. Shared by incremental MV
        maintenance (mview.py) and the change data feed (``changes``):
        both bound their scans to exactly these buckets, which is what
        keeps them trickle-epoch-cheap at 100 TB."""
        man_old, man_new = self.manifest(v_old), self.manifest(v_new)
        if "file_groups" not in man_old or "file_groups" not in man_new:
            return None
        if man_old["n_buckets"] != man_new["n_buckets"]:
            # rebucket in the interval: every file was rewritten and the
            # two versions' bucket spaces don't align — "all buckets" is
            # both the physical truth and the only consistent answer
            return None
        n_buckets = man_new["n_buckets"]
        go = man_old["file_groups"]["groups"]
        gn = man_new["file_groups"]["groups"]
        touched: set[int] = set()
        for g in set(go) | set(gn):
            ro, rn = go.get(g), gn.get(g)
            rpo = self._ref_path(ro.get("ref") or ro["path"]) if ro else None
            rpn = self._ref_path(rn.get("ref") or rn["path"]) if rn else None
            if rpo == rpn:
                continue  # group untouched between the two versions
            fo = self._resolve_ref(ro.get("ref") or ro["path"]) if ro else []
            fn = self._resolve_ref(rn.get("ref") or rn["path"]) if rn else []
            po = {f["path"]: f for f in fo}
            pn = {f["path"]: f for f in fn}
            for p in set(po) ^ set(pn):
                f = po.get(p) or pn[p]
                bmod = f.get("bmod")
                if bmod and bmod <= n_buckets:  # class file: whole residue class
                    touched.update(range(f["bucket"] % bmod, n_buckets, bmod))
                else:
                    touched.add(f["bucket"])
        return touched

    def changes(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed between two snapshots (Delta CDF / Iceberg
        changelog analog) — the CDC-OUT surface closing the loop for
        downstream consumers: one row per url whose live state differs
        between ``from_version`` and ``to_version`` (default head), with
        change_type in {'insert','update','delete'} and the before/after
        seq. Telescopes like the incremental MV: any version distance is
        two scans bounded to the touched buckets (metadata diff), joined
        full-outer on url — keyed, never a table rescan on trickle
        epochs. Unchanged carried rows (COW rewrites copy rows without
        touching them) drop out on seq equality, so compaction/rewrite
        commits emit an empty feed."""
        v1 = self.head_version() if to_version is None else to_version
        man = self.manifest(v1)
        n_buckets = man["n_buckets"]
        touched = self.touched_buckets_between(from_version, v1)
        user_cols = [f.name for f in T.StructType.fromJson(man["schema"]).fields]

        def _live(version: int) -> DataFrame:
            df = self.scan_internal(spark, version, buckets=touched)
            df = df.where(~F.col(INTERNAL_DELETED))
            if touched is not None:
                df = df.where(
                    bucket_expr("url", n_buckets).isin([int(b) for b in touched])
                )
            # conform older snapshots to the head schema (evolution NULL-fill)
            have = set(df.columns)
            for f in T.StructType.fromJson(man["schema"]).fields:
                if f.name not in have:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            return df.select("url", F.col(INTERNAL_SEQ).alias("_seq_v"), *[c for c in user_cols if c != "url"])

        old = _live(from_version).alias("o")
        new = _live(v1).alias("n")
        j = old.join(new, F.col("o.url") == F.col("n.url"), "full_outer")
        change = (
            F.when(F.col("o.url").isNull(), F.lit("insert"))
            .when(F.col("n.url").isNull(), F.lit("delete"))
            .when(F.col("o._seq_v") != F.col("n._seq_v"), F.lit("update"))
        )  # same url, same seq => carried row, not a change (NULL => filtered)
        payload = [c for c in user_cols if c != "url"]
        return (
            j.select(
                F.coalesce(F.col("n.url"), F.col("o.url")).alias("url"),
                change.alias("change_type"),
                F.col("o._seq_v").alias("seq_before"),
                F.col("n._seq_v").alias("seq_after"),
                *[F.col(f"o.`{c}`").alias(f"before_{c}") for c in payload],
                *[F.col(f"n.`{c}`").alias(f"after_{c}") for c in payload],
            )
            .where(F.col("change_type").isNotNull())
        )

    def prunable_files_for(
        self, col_bounds: dict[str, tuple], version: int | None = None
    ) -> tuple[int, int]:
        """(files kept, files total) for a cluster-stat-bounded scan — the
        observability hook for the cluster_by data-skipping path."""
        files = self._files(self.manifest(version))
        kept = sum(1 for f in files if not self._cstats_disjoint(f, col_bounds))
        return kept, len(files)

    def prunable_files(self, ts_min, ts_max, version: int | None = None) -> tuple[int, int]:
        """(files kept, files total) for a time-bounded scan — the pruning
        observability hook used by tests and ops."""
        files = self._files(self.manifest(version))
        from datetime import datetime as _dt

        kept = 0
        for f in files:
            lo, hi = f.get("ts_min"), f.get("ts_max")
            if lo is None or hi is None:
                kept += 1
                continue
            flo, fhi = _dt.fromisoformat(lo), _dt.fromisoformat(hi)
            if (ts_max is None or flo <= ts_max) and (ts_min is None or fhi >= ts_min):
                kept += 1
        return kept, len(files)

    @staticmethod
    def _write_modulus(n_buckets: int, est_rows: int | None) -> int:
        """File-fanout modulus for a data write: n_buckets (one file per
        bucket, the steady-state layout) when the write is large or the
        table is small; otherwise the smallest multiple of the metadata
        group count that keeps files near TARGET_ROWS_PER_FILE. Always a
        multiple of n_groups so a class file's entries stay inside one
        file-group shard (metadata pruning keyed on bucket % n_groups
        remains exact)."""
        n_groups = min(FILE_GROUPS_MAX, n_buckets)
        if (
            est_rows is None
            or n_groups == n_buckets
            or n_buckets % n_groups != 0
        ):
            return n_buckets
        want = max(1, -(-est_rows // TARGET_ROWS_PER_FILE))
        if want >= n_buckets:
            return n_buckets
        return min(n_buckets, max(n_groups, -(-want // n_groups) * n_groups))

    # -------------------------------------------------------------- merge
    def merge(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        epoch_id: int,
        source_partition_col: str = "source_partition",
        collect_lineage: bool = True,
        input_stats: list[dict] | None = None,
        touched_buckets: list[int] | None = None,
        mor_lineage_stats: list[dict] | None = None,
        fast_obs=None,
        fast_pids: list | None = None,
        est_rows: int | None = None,
        quarantine_writer=None,
        cow_broadcast: bool = False,
        cow_merge: str = "window",
    ) -> dict[str, Any] | None:
        """CDC-apply one deduped micro-batch (S4/J1). Returns commit stats,
        or None when ``epoch_id`` is already in the ledger (idempotence, J4).

        ``batch_df`` must be one-row-per-url (run dedup.lww_dedup first —
        invariant 1 of SURVEY.md §4) with WAL columns (seq, op, payload...).

        ``input_stats``: optional pre-dedup per-source-partition rows
        ``{partition_id, rows_in, first_seq, last_seq, bytes}`` from
        apply_epoch, so ledger/lineage record the FULL consumed offset
        range, not just LWW winners. Without it, stats fall back to the
        (deduped) batch itself.

        ``mor_lineage_stats``: optional pre-aggregated MoR lineage rows
        ``{pid, rows_upserted, rows_deleted, rows_late_ignored, bytes}``
        (apply_epoch folds them into its pre-commit aggregate — one fewer
        job per epoch); requires ``input_stats``. Ignored in COW mode.

        ``fast_obs``/``fast_pids``: the MoR replay fast path (apply.
        _apply_mor_fast) — an Observation already attached below
        ``batch_df`` whose per-pid structs carry input stats, quarantine
        counts, lineage splits, and the touched-bucket set. merge then
        runs the write as the epoch's ONLY job and resolves all commit
        metadata from the observation afterwards. ``est_rows`` sizes the
        adaptive fanout (the expected seq-window width — exact for a
        dense WAL); ``quarantine_writer`` is invoked (still before the
        commit) only if the observation reports quarantined rows.

        ``cow_merge``: COW apply strategy (round 7, guide §2.4 "remove
        shuffles outright"). "window" (default) — the ONE-EXCHANGE form:
        UNION the conformed target rows with the batch winners, hash-
        repartition once on the output bucket, and pick the LWW winner
        per url with a row_number window partitioned by (_bucket, url)
        — hash partitioning on _bucket alone satisfies the window's
        clustered distribution (url determines bucket), so no second
        exchange is inserted, and the window's sort IS the write's
        required (bucket, url) clustering. The join path shuffled the
        full-width target TWICE per epoch (url-hash into the SMJ, then
        bucket-hash before the write) plus the batch once; this shuffles
        target+batch exactly once. "join" — the round-6 full-outer
        sort-merge form (with the broadcast variant under its gate),
        kept for A/B and regression tests; state/ledger/lineage are
        byte-identical across all three (tests/test_cow_broadcast.py).
        """
        t0 = time.monotonic()
        _plan_t0 = time.monotonic()
        man = self.manifest()
        if self.ledger_entry(epoch_id, man) is not None:
            return None
        n_buckets = man["n_buckets"]
        version = man["version"] + 1
        snapshot_id = f"v{version:08d}"

        # -- schema evolution: widen table schema by the batch's payload cols
        cur_schema = T.StructType.fromJson(man["schema"])
        incoming = T.StructType(
            [f for f in batch_df.schema.fields if f.name not in WAL_META_COLS]
        )
        new_schema = evolve_schema(cur_schema, incoming)
        user_cols = [f.name for f in new_schema.fields]
        src = conform(batch_df, new_schema, passthrough=WAL_META_COLS)
        src = src.withColumn("_bucket", bucket_expr("url", n_buckets))

        if fast_obs is not None:
            touched = None  # resolved from the observation after the write
        else:
            touched = (
                sorted(touched_buckets)
                if touched_buckets is not None
                else sorted(
                    r["_bucket"] for r in src.select("_bucket").distinct().collect()
                )
            )

        mode = man.get("mode", "cow")
        obs = obs_pids = None
        prepart = False  # window strategy: result is already partitioned+sorted
        u_win = None  # window strategy's pre-filter relation (lineage fallback)
        carried_rows = 0  # COW only: target rows rewritten alongside the batch
        if mode == "mor":
            # merge-on-read: the deduped batch IS the delta — no target read,
            # no join. Tombstones ride along as _deleted rows; scan collapses.
            #
            # Lineage for this mode is a per-source-partition aggregate over
            # the SAME rows the write consumes, so it rides INSIDE the write
            # job via an Observation node (map-side, no extra job barrier)
            # instead of a second collect — the pids are known up front from
            # input_stats, so the aggregate unrolls to a few counters each.
            if (
                collect_lineage
                and mor_lineage_stats is None
                and input_stats is not None
            ):
                from pyspark.sql import Observation

                obs_pids = [s["partition_id"] for s in input_stats]
                has_sp0 = source_partition_col in batch_df.columns
                sp0 = (
                    f"cast({source_partition_col} as int)"
                    if has_sp0
                    else "cast(null as int)"
                )
                blen0 = (
                    "octet_length(html)"
                    if "html" in batch_df.columns
                    else "cast(null as int)"
                )
                # ONE F.expr per pid (a named_struct of the aggregates):
                # building these as column-object trees cost ~30 py4j round
                # trips per pid — measured 0.2s/epoch of pure driver time
                # at this workload's partition count, a serial term at any
                # cluster size. A single SQL string is one round trip.
                exprs = []
                for p in obs_pids:
                    m = f"({sp0}) is null" if p is None else f"({sp0}) = {int(p)}"
                    tag = "null" if p is None else str(p)
                    exprs.append(
                        F.expr(
                            f"named_struct("
                            f"'up', sum(case when ({m}) and op != 'delete' then 1 else 0 end), "
                            f"'del', sum(case when ({m}) and op = 'delete' then 1 else 0 end), "
                            f"'late', cast(null as bigint), "
                            f"'b', cast(coalesce(sum(case when ({m}) then {blen0} end), 0) as bigint)"
                            f") as pid_{tag}"
                        )
                    )
                obs = Observation(f"lineage_e{epoch_id}_v{version}")
                src = src.observe(obs, *exprs)
            j = s_here = s_newer = t_here = None
            result = src.select(
                *user_cols,
                F.col("seq").alias(INTERNAL_SEQ),
                (F.col("op") == F.lit("delete")).alias(INTERNAL_DELETED),
                F.col("_bucket"),
            )
        else:
            # resolve the covering file list once: it feeds both the target
            # scan and the fanout estimate (a COW rewrite emits batch rows
            # PLUS every carried row from these files — sizing class files
            # off batch rows alone made a small epoch on a large table
            # write a few oversized files; round-4 ADVICE)
            tgt_files = self._files(man, set(touched))
            carried_rows = sum(int(f.get("rows") or 0) for f in tgt_files)
            tgt = self.scan_internal(spark, files=tgt_files)
            # target conformed to the evolved schema (old snapshot may be narrower)
            tgt = conform(tgt, _internal_schema(new_schema))

            if not cow_broadcast and cow_merge == "window":
                # ---- ONE-EXCHANGE union+window CDC apply (round 7) ----
                # See the ``cow_merge`` parameter notes. Fanout modulus and
                # partition width are fixed BEFORE the plan (pure metadata:
                # input_stats rows + manifest carried rows) so the single
                # repartition IS the write layout; the window then needs no
                # exchange of its own (hash on _bucket satisfies clustering
                # on (_bucket, url)) and its sort doubles as the writer's
                # required bucket clustering + the per-file url ordering.
                from pyspark.sql import Observation, Window as _W

                est = est_rows
                if est is None and input_stats is not None:
                    est = sum(int(st["rows_in"]) for st in input_stats)
                if est is not None:
                    est += carried_rows
                ft = self._write_modulus(n_buckets, est)
                nparts = max(
                    1,
                    min(
                        ft if ft < n_buckets else len(touched),
                        spark.sparkContext.defaultParallelism,
                    ),
                )
                sp_sql0 = (
                    f"cast({source_partition_col} as int)"
                    if source_partition_col in batch_df.columns
                    else "cast(null as int)"
                )
                t_side = tgt.select(
                    *[F.col(f"`{c}`") for c in user_cols],
                    F.col(INTERNAL_SEQ).alias("_mseq"),
                    F.col(INTERNAL_DELETED).alias("_mdel"),
                    F.expr("cast(null as string)").alias("_mop"),
                    F.expr("cast(null as int)").alias("_mpid"),
                    F.lit(False).alias("_msrc"),
                )
                s_side = src.select(
                    *[F.col(f"`{c}`") for c in user_cols],
                    F.col("seq").alias("_mseq"),
                    F.lit(False).alias("_mdel"),
                    F.col("op").alias("_mop"),
                    F.expr(sp_sql0).alias("_mpid"),
                    F.lit(True).alias("_msrc"),
                )
                u = t_side.unionByName(s_side).withColumn(
                    "_bucket", F.expr(f"pmod(xxhash64(url), {n_buckets})")
                )
                if ft < n_buckets:
                    u = u.withColumn("_bucket", F.pmod(F.col("_bucket"), F.lit(ft)))
                u = u.repartition(nparts, F.col("_bucket"))
                # LWW winner per url: strictly-newer wins, so ties (which
                # the ledger makes impossible) break to the TARGET row —
                # exactly the join path's `s strictly newer than t`
                w_lww = _W.partitionBy("_bucket", "url").orderBy(
                    F.col("warc_ts").desc(),
                    F.col("_mseq").desc(),
                    F.col("_msrc").asc(),
                )
                u = u.withColumn("_rn", F.row_number().over(w_lww))
                if collect_lineage and input_stats is None:
                    # direct-merge lineage fallback needs the inserted-vs-
                    # updated split: count target rows per url group (same
                    # window partitioning -> no extra exchange)
                    u = u.withColumn(
                        "_thit",
                        F.sum(F.when(~F.col("_msrc"), 1).otherwise(0)).over(
                            _W.partitionBy("_bucket", "url")
                        ),
                    )
                u_win = u
                if collect_lineage and input_stats is not None:
                    # lineage rides the SAME write job (observe sits below
                    # the rn filter so loser source rows are still counted
                    # as late_ignored) — semantics identical to the join
                    # path's Observation: up/del = source row won, late =
                    # source row lost, bytes = all source rows' payload
                    obs_pids = [s_["partition_id"] for s_ in input_stats]
                    blen0 = (
                        "octet_length(html)"
                        if "html" in batch_df.columns
                        else "cast(null as int)"
                    )
                    exprs = []
                    for p in obs_pids:
                        m = (
                            "_msrc and _mpid is null"
                            if p is None
                            else f"_msrc and _mpid = {int(p)}"
                        )
                        tag = "null" if p is None else str(p)
                        exprs.append(
                            F.expr(
                                f"named_struct("
                                f"'up', sum(case when ({m}) and _rn = 1 and _mop != 'delete' then 1 else 0 end), "
                                f"'del', sum(case when ({m}) and _rn = 1 and _mop = 'delete' then 1 else 0 end), "
                                f"'late', sum(case when ({m}) and _rn > 1 then 1 else 0 end), "
                                f"'b', cast(coalesce(sum(case when ({m}) then {blen0} end), 0) as bigint)"
                                f") as pid_{tag}"
                            )
                        )
                    obs = Observation(f"lineage_e{epoch_id}_v{version}")
                    u = u.observe(obs, *exprs)
                result = u.where(F.col("_rn") == 1).select(
                    *[F.col(f"`{c}`") for c in user_cols],
                    F.col("_mseq").alias(INTERNAL_SEQ),
                    F.expr("case when _msrc then _mop = 'delete' else _mdel end").alias(
                        INTERNAL_DELETED
                    ),
                    F.col("_bucket"),
                )
                prepart = True
            else:
                if cow_broadcast:
                    # broadcast CDC-apply (round 6): the epoch's winners fit a
                    # broadcast (prepare_epoch's map-side estimate), so the
                    # WIDE TARGET NEVER ENTERS A JOIN EXCHANGE — updates are a
                    # map-side target LEFT JOIN broadcast(batch), inserts a
                    # batch ANTI JOIN over a column-pruned url-only target
                    # scan. The only remaining full-width shuffle is the
                    # bucket repartition before the write (the join path pays
                    # that PLUS a both-sides url shuffle). Both branches are
                    # packed into (t, s) STRUCT columns so every downstream
                    # expression (winner predicate, per-column pick, lineage
                    # Observation) is shared verbatim with the full-outer
                    # path: t.url / s.`col` resolve as struct fields, a NULL
                    # t struct behaves exactly like the outer join's
                    # null-extended t side. Result rows are byte-identical
                    # (tests/test_cow_broadcast.py).
                    j = _cow_broadcast_plan(tgt, src)
                else:
                    j = tgt.alias("t").join(src.alias("s"), F.col("t.url") == F.col("s.url"), "full_outer")
                # winner predicate + per-column pick, as SQL strings: one py4j
                # round trip per column instead of the ~6 a when/otherwise
                # column tree costs — this is per-epoch DRIVER time (serial at
                # any cluster size; measured ~0.17s/epoch as column objects)
                newer_sql = (
                    "(case when t.url is null then true "
                    "when s.url is null then false "
                    "else (s.warc_ts > t.warc_ts) or "
                    f"(s.warc_ts = t.warc_ts and s.seq > t.{INTERNAL_SEQ}) end)"
                )
                s_newer = F.expr(newer_sql)
                # needed by the no-input_stats lineage fallback below (direct
                # merge() callers; apply_epoch always passes input_stats and
                # takes the Observation path instead)
                s_here = F.col("s.url").isNotNull()
                t_here = F.col("t.url").isNotNull()
                pick = [
                    F.expr(f"case when {newer_sql} then s.`{c}` else t.`{c}` end as `{c}`")
                    for c in user_cols
                ]
                if collect_lineage and input_stats is not None:
                    # COW lineage rides INSIDE the write job via an Observation
                    # on the full-outer join (same lever the MoR path got one
                    # round earlier): the outcome split per source partition is
                    # collected map-side while the winners stream to parquet,
                    # removing the separate narrow re-join job — one Spark job
                    # barrier per epoch, pure serial time at any cluster size.
                    # One F.expr per pid (a named_struct of the 4 aggregates):
                    # column-object trees here cost ~30 py4j round trips per
                    # pid of driver time.
                    from pyspark.sql import Observation

                    obs_pids = [s["partition_id"] for s in input_stats]
                    sh = "s.url is not null"
                    newer = (
                        "(case when t.url is null then true "
                        "when s.url is null then false "
                        "else (s.warc_ts > t.warc_ts) or "
                        f"(s.warc_ts = t.warc_ts and s.seq > t.{INTERNAL_SEQ}) end)"
                    )
                    sp_sql = (
                        f"cast(s.{source_partition_col} as int)"
                        if source_partition_col in batch_df.columns
                        else "cast(null as int)"
                    )
                    blen_sql = (
                        "octet_length(s.html)"
                        if "html" in batch_df.columns
                        else "cast(null as int)"
                    )
                    exprs = []
                    for p in obs_pids:
                        m = (
                            f"({sh}) and ({sp_sql}) is null"
                            if p is None
                            else f"({sh}) and ({sp_sql}) = {int(p)}"
                        )
                        tag = "null" if p is None else str(p)
                        exprs.append(
                            F.expr(
                                f"named_struct("
                                f"'up', sum(case when ({m}) and ({newer}) and s.op != 'delete' then 1 else 0 end), "
                                f"'del', sum(case when ({m}) and ({newer}) and s.op = 'delete' then 1 else 0 end), "
                                f"'late', sum(case when ({m}) and not ({newer}) then 1 else 0 end), "
                                f"'b', cast(coalesce(sum(case when ({m}) then {blen_sql} end), 0) as bigint)"
                                f") as pid_{tag}"
                            )
                        )
                    obs = Observation(f"lineage_e{epoch_id}_v{version}")
                    j = j.observe(obs, *exprs)
                result = j.select(
                    *pick,
                    F.expr(
                        f"case when {newer_sql} then s.seq else t.{INTERNAL_SEQ} end "
                        f"as {INTERNAL_SEQ}"
                    ),
                    F.expr(
                        f"case when {newer_sql} then s.op = 'delete' "
                        f"else t.{INTERNAL_DELETED} end as {INTERNAL_DELETED}"
                    ),
                    # same bucket function as salt.bucket_expr (pmod/xxhash64
                    # with Spark's default seed 42)
                    F.expr(
                        f"coalesce(s._bucket, pmod(xxhash64(t.url), {n_buckets})) as _bucket"
                    ),
                )

        # one output file per touched bucket: repartition ON the bucket id,
        # cluster by url inside each file (O3, MERGE locality)
        commit_seed = f"{man['table_uuid']}:{epoch_id}"
        commit_id = "c" + _stable_hash(commit_seed)
        out_rel = os.path.join("data", commit_id)
        out_abs = os.path.join(self.path, out_rel)
        if os.path.exists(out_abs):
            # dir exists: either debris from a crash between data write and
            # manifest commit, or a peer committed this epoch after our head
            # read. Distinguish with a FRESH head read — never clobber files
            # a published manifest references.
            if self.ledger_entry(int(epoch_id), self.manifest()) is not None:
                return None
            import shutil

            # crash debris by every check we can make — but if a SECOND
            # live tailer (out of contract: the engine assumes one logical
            # tailer per table) is mid-write here, this rmtree would eat
            # its files. Log loudly with the debris age so a violated
            # single-tailer assumption is diagnosable, not silent.
            try:
                newest = max(
                    (os.path.getmtime(os.path.join(r, f))
                     for r, _, fs in os.walk(out_abs) for f in fs),
                    default=os.path.getmtime(out_abs),
                )
                age = time.time() - newest
            except OSError:
                age = float("nan")
            print(
                f"[cdc_engine] clearing crash debris {out_abs} "
                f"(epoch {epoch_id} absent from fresh ledger; newest file "
                f"{age:.1f}s old — if a concurrent tailer wrote this, the "
                f"single-logical-tailer contract is being violated)",
                file=sys.stderr,
            )
            shutil.rmtree(out_abs)
        # adaptive fanout: collapse per-bucket files into bucket-CLASS
        # files when the epoch is small (file count tracks data, not
        # bucket count — a 50k-row epoch on a 4096-bucket table writes
        # ~64 files, not 4096 tiny ones)
        if not prepart:
            # (the window strategy computed ft/nparts up front and baked
            # the modulus + repartition into its single exchange)
            if est_rows is None and input_stats is not None:
                est_rows = sum(int(st["rows_in"]) for st in input_stats)
            if est_rows is not None and carried_rows:
                # a COW rewrite emits the carried target rows too — without
                # them the modulus tracks batch size, not bytes written
                est_rows += carried_rows
            ft = self._write_modulus(n_buckets, est_rows)
            if ft < n_buckets:
                result = result.withColumn(
                    "_bucket", F.pmod(F.col("_bucket"), F.lit(ft))
                )
            nparts = max(
                1,
                min(ft if ft < n_buckets else (n_buckets if touched is None else len(touched)),
                    spark.sparkContext.defaultParallelism),
            )
        from cdc_engine import timing as _timing
        if _timing.enabled():
            # plan-construction span: everything from the manifest read to
            # the write action — per-epoch DRIVER time (serial at any
            # cluster size), the term the F.expr conversions above shrink
            _timing.records.append(("merge_plan", time.monotonic() - _plan_t0))
            if mode != "mor":
                _timing.records.append(
                    (
                        "cow_apply_broadcast"
                        if cow_broadcast
                        else ("cow_apply_window" if prepart else "cow_apply_join"),
                        0.0,
                    )
                )
        with phase("data_write"):
            out_df = (
                result  # window strategy: already bucket-partitioned + sorted
                if prepart
                else result.repartition(nparts, F.col("_bucket")).sortWithinPartitions("url")
            )
            out_df.write.mode("errorifexists").partitionBy("_bucket").parquet(out_abs)

        with phase("footer_stats"):
            new_files = _walk_bucket_files(
                self.path, out_rel, man.get("key_blooms", False)
            )
        if ft < n_buckets:
            for f in new_files:
                f["bmod"] = ft  # class file: covers residue f["bucket"] mod ft
        if mode == "mor":
            for f in new_files:
                f["kind"] = "delta"  # append-only; compaction folds
        if fast_obs is not None:
            # resolve ALL commit metadata from the write job's two
            # Observations (the epoch's only job): obs_in = consumed input
            # (pre-filter), obs_out = applied rows (post-filter/dedup —
            # byte-identical lineage semantics to the stats-job path)
            obs_in, obs_out = fast_obs
            in_vals = obs_in.get
            if int(in_vals["_total"]) == 0:
                # empty window: nothing written, nothing to commit
                import shutil

                shutil.rmtree(out_abs, ignore_errors=True)
                return None
            out_vals = obs_out.get
            per_pid = []
            for p in fast_pids:
                tag = "null" if p is None else str(p)
                st = in_vals[f"pid_{tag}"]
                if int(st["seen"]) == 0:
                    continue  # footer-bound superset: pid absent this epoch
                per_pid.append((p, st, out_vals[f"pid_{tag}"]))
            if sum(int(st["seen"]) for _p, st, _o in per_pid) != int(in_vals["_total"]):
                raise RuntimeError(
                    f"epoch {epoch_id}: source_partition values outside the "
                    f"footer-stat bound {fast_pids[:1]}..{fast_pids[-1:]} — "
                    f"WAL statistics are untrustworthy; rerun without the "
                    f"fast path"
                )
            input_stats = [
                {
                    "partition_id": None if p is None else int(p),
                    "rows_in": int(st["seen"]) - int(st["q"]),
                    "rows_quarantined": int(st["q"]),
                    "first_seq": None if st["lo"] is None else int(st["lo"]),
                    "last_seq": None if st["hi"] is None else int(st["hi"]),
                    "bytes": None,
                }
                for p, st, _o in per_pid
            ]
            mor_lineage_stats = [
                {
                    "pid": None if p is None else int(p),
                    "rows_upserted": int(o["up"]),
                    "rows_deleted": int(o["del"]),
                    "rows_late_ignored": None,
                    "bytes": int(o["b"]),
                }
                for p, _st, o in per_pid
                if int(o["up"]) or int(o["del"]) or int(o["b"])
            ]
            touched = sorted(int(b) for b in (out_vals["_touched"] or []))
            if quarantine_writer is not None and any(
                int(st["q"]) for _p, st, _o in per_pid
            ):
                quarantine_writer()  # rare path; still before the commit
            if not touched:
                # every row was quarantined; nothing to commit
                import shutil

                shutil.rmtree(out_abs, ignore_errors=True)
                return None
        bundle = _SideBundle(
            os.path.join("metadata", f"commit-{man['table_uuid'][:8]}-{commit_id}.json")
        )
        with phase("advance_groups"):
            file_groups = self._advance_file_groups(
                man, commit_id, set(touched), new_files, bundle
            )

        # -- stats for ledger + lineage (narrow second pass: Catalyst prunes
        # html/text out of both scans; the join re-runs on slim columns)
        if input_stats is not None:
            lo = min(s["first_seq"] for s in input_stats) if input_stats else None
            hi = max(s["last_seq"] for s in input_stats) if input_stats else None
        else:
            r0 = batch_df.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
            lo = None if r0["lo"] is None else int(r0["lo"])
            hi = None if r0["hi"] is None else int(r0["hi"])
        lineage_rows: list[dict] = []
        if collect_lineage:
            has_sp = source_partition_col in batch_df.columns
            if mode == "mor" and mor_lineage_stats is not None:
                # apply_epoch already folded the upsert/delete/byte split
                # into its combined pre-commit aggregate — no extra job
                stats = mor_lineage_stats
            elif obs is not None:
                # the write job's Observation collected the aggregates
                # map-side (both modes; COW observes the full-outer join);
                # obs.get is already complete (the write action above
                # finished) — zero extra jobs
                vals = obs.get
                stats = []
                for p in obs_pids:
                    tag = "null" if p is None else str(p)
                    st = vals[f"pid_{tag}"]
                    late = st["late"]
                    row = {
                        "pid": p,
                        "rows_upserted": int(st["up"]),
                        "rows_deleted": int(st["del"]),
                        "rows_late_ignored": None if late is None else int(late),
                        "bytes": int(st["b"]),
                    }
                    # normalize the absent-pid encoding across lineage
                    # modes (round-3 advisor): a pid with no surviving
                    # rows is OMITTED (as the collect-based path did),
                    # not emitted as an all-zero observation row
                    if (
                        row["rows_upserted"]
                        or row["rows_deleted"]
                        or row["rows_late_ignored"]
                        or row["bytes"]
                    ):
                        stats.append(row)
            elif mode == "mor":
                # no target read in MoR: upsert/delete split comes from the
                # batch ops; late-vs-fresh classification is deferred to
                # scan-time collapse (Iceberg MoR behaves the same way)
                sp_col = (
                    F.col(source_partition_col).cast("int") if has_sp else F.lit(None).cast("int")
                )
                blen = (
                    F.octet_length("html") if "html" in batch_df.columns else F.lit(None).cast("int")
                )
                stats = (
                    batch_df.select(
                        sp_col.alias("pid"), "op", "seq", blen.alias("b"),
                    )
                    .groupBy("pid")
                    .agg(
                        F.count("*").alias("rows_applied"),
                        F.min("seq").alias("first_seq"),
                        F.max("seq").alias("last_seq"),
                        F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("rows_upserted"),
                        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("rows_deleted"),
                        F.lit(None).cast("long").alias("rows_late_ignored"),
                        F.coalesce(F.sum("b"), F.lit(0)).alias("bytes"),
                    )
                )
                with phase("lineage_agg"):
                    stats = stats.collect()
            elif prepart:
                # window-strategy direct-merge fallback: same outcome
                # classification as the join path, read off the union+
                # window relation (an extra job, exactly like the join
                # fallback re-running the join on slim columns)
                sp_col = F.col("_mpid")
                outcome = (
                    F.when(F.col("_rn") > 1, F.lit("late_ignored"))
                    .when(F.col("_mop") == "delete", F.lit("deleted"))
                    .when(F.col("_thit") == 0, F.lit("inserted"))
                    .otherwise(F.lit("updated"))
                )
                stats = (
                    u_win.where(F.col("_msrc"))
                    .select(
                        sp_col.alias("pid"), outcome.alias("oc"),
                        F.col("_mseq").alias("seq"),
                        (
                            F.octet_length("html")
                            if "html" in batch_df.columns
                            else F.lit(None).cast("int")
                        ).alias("b"),
                    )
                    .groupBy("pid")
                    .agg(
                        F.count("*").alias("rows_applied"),
                        F.min("seq").alias("first_seq"),
                        F.max("seq").alias("last_seq"),
                        F.sum(F.when(F.col("oc").isin("inserted", "updated"), 1).otherwise(0)).alias("rows_upserted"),
                        F.sum(F.when(F.col("oc") == "deleted", 1).otherwise(0)).alias("rows_deleted"),
                        F.sum(F.when(F.col("oc") == "late_ignored", 1).otherwise(0)).alias("rows_late_ignored"),
                        F.coalesce(F.sum("b"), F.lit(0)).alias("bytes"),
                    )
                )
                with phase("lineage_agg"):
                    stats = stats.collect()
            else:
                sp_col = (
                    F.col(f"s.{source_partition_col}").cast("int")
                    if has_sp
                    else F.lit(None).cast("int")
                )
                outcome = (
                    F.when(~s_newer, F.lit("late_ignored"))
                    .when(F.col("s.op") == "delete", F.lit("deleted"))
                    .when(~t_here, F.lit("inserted"))
                    .otherwise(F.lit("updated"))
                )
                stats = (
                    j.where(s_here)
                    .select(
                        sp_col.alias("pid"), outcome.alias("oc"),
                        F.col("s.seq").alias("seq"),
                        (
                            F.octet_length(F.col("s.html"))
                            if "html" in batch_df.columns
                            else F.lit(None).cast("int")
                        ).alias("b"),
                    )
                    .groupBy("pid")
                    .agg(
                        F.count("*").alias("rows_applied"),
                        F.min("seq").alias("first_seq"),
                        F.max("seq").alias("last_seq"),
                        F.sum(F.when(F.col("oc").isin("inserted", "updated"), 1).otherwise(0)).alias("rows_upserted"),
                        F.sum(F.when(F.col("oc") == "deleted", 1).otherwise(0)).alias("rows_deleted"),
                        F.sum(F.when(F.col("oc") == "late_ignored", 1).otherwise(0)).alias("rows_late_ignored"),
                        F.coalesce(F.sum("b"), F.lit(0)).alias("bytes"),
                    )
                )
                with phase("lineage_agg"):
                    stats = stats.collect()
            latency_ms = (time.monotonic() - t0) * 1000.0
            by_pid = {
                (None if r["pid"] is None else int(r["pid"])): r for r in stats
            }
            in_by_pid = (
                {s["partition_id"]: s for s in input_stats}
                if input_stats is not None
                else {
                    pid: {
                        "partition_id": pid,
                        "rows_in": int(r["rows_applied"]),
                        "rows_quarantined": 0,
                        "first_seq": int(r["first_seq"]),
                        "last_seq": int(r["last_seq"]),
                        "bytes": None,
                    }
                    for pid, r in by_pid.items()
                }
            )
            lineage_rows = []
            for pid, ins in sorted(in_by_pid.items(), key=lambda kv: (kv[0] is None, kv[0])):
                r = by_pid.get(pid)
                lineage_rows.append(
                    {
                        "epoch_id": int(epoch_id),
                        "partition_id": pid,
                        "first_seq": int(ins["first_seq"]),
                        "last_seq": int(ins["last_seq"]),
                        "snapshot_id": snapshot_id,
                        "rows_in": int(ins["rows_in"]),
                        "rows_upserted": 0 if r is None else int(r["rows_upserted"]),
                        "rows_deleted": 0 if r is None else int(r["rows_deleted"]),
                        "rows_late_ignored": (
                            0 if r is None
                            else None if r["rows_late_ignored"] is None
                            else int(r["rows_late_ignored"])
                        ),
                        "rows_quarantined": int(ins.get("rows_quarantined", 0)),
                        # bytes applied (winner payload), measured off the
                        # cached deduped batch — never a second wide scan
                        "bytes": (
                            int(r["bytes"])
                            if r is not None and "bytes" in r
                            else None if ins.get("bytes") is None else int(ins["bytes"])
                        ),
                        "apply_latency_ms": latency_ms,
                    }
                )

        # -- metadata commit with optimistic-concurrency retry (the Iceberg
        # commit-retry analog): a concurrent writer publishing first makes
        # _write_manifest's exclusive create raise; re-read HEAD, no-op if
        # the peer committed THIS epoch (drop our unreferenced data dir),
        # else rebase the metadata plane onto the new head and try again.
        # Data files never move — they are keyed by commit_id, and only a
        # published manifest references them.
        max_races = 5
        for _race in range(max_races):
            ledger_entry = {
                "commit_id": commit_id,
                "epoch_id": int(epoch_id),
                "first_seq": lo,
                "last_seq": hi,
                "committed_at": datetime.now(timezone.utc).isoformat(),
                "snapshot_id": snapshot_id,
            }
            for row in lineage_rows:
                row["snapshot_id"] = snapshot_id
            with phase("commit_meta"):
                inline_ledger, ledger_spill = self._advance_ledger(
                    man, int(epoch_id), ledger_entry, bundle
                )
                if bundle.members:
                    self._write_side_json(bundle.rel_path, bundle.members)
            new_man = {
                "version": version,
                "table_uuid": man["table_uuid"],
                "schema": new_schema.jsonValue(),
                "n_buckets": n_buckets,
                "mode": mode,
                "key_blooms": man.get("key_blooms", False),
                "file_groups": file_groups,
                "parent": man["version"],
                "summary": {
                    "commit_id": commit_id,
                    "epoch_id": int(epoch_id),
                    "first_seq": ledger_entry["first_seq"],
                    "last_seq": ledger_entry["last_seq"],
                    "touched_buckets": len(touched),
                    "files_written": len(new_files),
                },
                "ledger": inline_ledger,
                "ledger_spill": ledger_spill,
                "lineage": lineage_rows,
            }
            try:
                with phase("commit_meta"):
                    self._write_manifest(new_man)
                break
            except FileExistsError:
                man = self.manifest()
                if self.ledger_entry(int(epoch_id), man) is not None:
                    # the peer committed exactly this epoch: clean no-op.
                    # Leave the data dir alone — with interleaved same-path
                    # writes it may be the very dir the peer's manifest
                    # references; if it is truly ours and orphaned,
                    # expire_snapshots' vacuum reclaims it by reference set.
                    return None
                if man["version"] < version and os.path.isfile(
                    self._manifest_path(version)
                ):
                    self._clear_unpublished_manifest(version)
                    man = self.manifest()
                    # fall through to the common rebase: it recomputes the
                    # target version from the fresh head (the SAME number
                    # if debris was cleared) and, crucially, rebuilds the
                    # side bundle fresh (reusing the populated one would
                    # duplicate its members)
                # rebase: head schema may have evolved under us; table
                # schema becomes the union (our already-written files are
                # narrower-or-equal and NULL-fill at read, same as any
                # pre-evolution file)
                new_schema = evolve_schema(
                    T.StructType.fromJson(man["schema"]), incoming
                )
                version = man["version"] + 1
                snapshot_id = f"v{version:08d}"
                bundle = _SideBundle(
                    os.path.join(
                        "metadata",
                        f"commit-{man['table_uuid'][:8]}-{commit_id}.json",
                    )
                )
                file_groups = self._advance_file_groups(
                    man, commit_id, set(touched), new_files, bundle
                )
        else:
            raise RuntimeError(
                f"epoch {epoch_id}: lost {max_races} manifest races in a row "
                f"(a crashed peer may have left an unpublished manifest for "
                f"version {version}; inspect {self.meta_dir})"
            )
        return {
            "version": version,
            "commit_id": commit_id,
            "snapshot_id": snapshot_id,
            "touched_buckets": touched,
            "lineage": lineage_rows,
            "apply_latency_ms": (time.monotonic() - t0) * 1000.0,
        }

    # --------------------------------------------------------- compaction
    def bucket_file_counts(self) -> dict[int, int]:
        """Files covering each bucket (a class file counts toward every
        bucket in its residue class — that is exactly the number of files
        a bucket-scoped scan of that bucket must read)."""
        man = self.manifest()
        nb = man["n_buckets"]
        counts: dict[int, int] = {}
        for f in self._files(man):
            m = f.get("bmod", nb)
            for b in range(f["bucket"] % m, nb, m):
                counts[b] = counts.get(b, 0) + 1
        return counts

    def compact(
        self,
        spark: SparkSession,
        buckets: list[int],
        purge_tombstones_older_than_seq: int | None = None,
        cluster_by: list[str] | None = None,
        cluster_files_per_bucket: int | None = None,
    ) -> dict[str, Any] | None:
        """Fold the given buckets' base+delta files into fresh base files
        (the Iceberg rewrite_data_files analog). Logical state is unchanged
        — scan_internal already collapses — so this is a pure physical
        rewrite, committed as its own snapshot. Deterministic: triggered by
        file counts, which depend only on the epoch sequence.

        ``purge_tombstones_older_than_seq``: optionally drop tombstone rows
        whose winning seq is below the given WAL horizon. Safe ONLY when the
        caller guarantees no event with seq < horizon can still arrive
        (i.e. the source's replay window has passed) — otherwise a purged
        tombstone would let an ancient out-of-order insert resurrect the
        url. Live-row semantics are unaffected either way.

        ``cluster_by``: Iceberg sort-order / Delta OPTIMIZE ZORDER analog.
        Each bucket's rows are range-split into ``cluster_files_per_bucket``
        files CONTIGUOUS in (cluster cols, url) order (ntile within the
        bucket — a sort over rows this job already shuffled, no extra
        exchange), and every written file's manifest entry records min/max
        footer stats for the cluster columns. ``scan(col_bounds=...)`` then
        prunes whole files whose range is provably disjoint — at 100 TB a
        predicate on a clustered column reads ~1/k of each bucket instead
        of all of it, composing with (not replacing) the url-hash bucket
        pruning that keyed reads use. Default fanout: per-bucket rows /
        TARGET_ROWS_PER_FILE, clamped to [1, 64]."""
        man = self.manifest()
        if not buckets:
            return None
        version = man["version"] + 1
        commit_id = "k" + _stable_hash(f"{man['table_uuid']}:compact:{version}")
        out_rel = os.path.join("data", commit_id)
        out_abs = os.path.join(self.path, out_rel)
        if os.path.exists(out_abs):
            import shutil

            shutil.rmtree(out_abs)
        # coverage-closure expansion: a bucket-class delta file covering a
        # requested bucket also holds rows of its OTHER residue-class
        # buckets; collapsing those rows against a subset of their files
        # (and keeping their old base files) would leave a url in two base
        # files. Expand the set until every selected file's full coverage
        # is inside it — replacement set == coverage closure, preserving
        # the one-base-file-per-url invariant.
        nb = man["n_buckets"]
        bucket_set = set(buckets)
        while True:
            cov: set[int] = set()
            for f in self._files(man, bucket_set):
                m = f.get("bmod", nb)
                cov.update(range(f["bucket"] % m, nb, m))
            if cov <= bucket_set:
                break
            bucket_set |= cov
        files_in = self._files(man, bucket_set)
        est_rows = sum(int(f.get("rows") or 0) for f in files_in) or None
        collapsed = self.scan_internal(spark, buckets=bucket_set)
        if purge_tombstones_older_than_seq is not None:
            collapsed = collapsed.where(
                ~(
                    F.col(INTERNAL_DELETED)
                    & (F.col(INTERNAL_SEQ) < purge_tombstones_older_than_seq)
                )
            )
        collapsed = collapsed.withColumn(
            "_bucket", bucket_expr("url", man["n_buckets"])
        )
        # same adaptive fanout as merge: compacting a small table must not
        # re-explode it into one tiny file per bucket
        ft = self._write_modulus(nb, est_rows)
        if ft < nb:
            collapsed = collapsed.withColumn(
                "_bucket", F.pmod(F.col("_bucket"), F.lit(ft))
            )
        nparts = max(
            1,
            min(ft if ft < nb else len(bucket_set),
                spark.sparkContext.defaultParallelism),
        )
        if cluster_by:
            from pyspark.sql.window import Window

            have = set(collapsed.columns)
            missing = [c for c in cluster_by if c not in have]
            if missing:
                raise ValueError(f"cluster_by columns not in schema: {missing}")
            per_bucket = None if est_rows is None else est_rows // max(1, len(bucket_set))
            k = cluster_files_per_bucket or (
                1
                if per_bucket is None
                else max(1, min(64, -(-per_bucket // TARGET_ROWS_PER_FILE)))
            )
            w = Window.partitionBy("_bucket").orderBy(*cluster_by, "url")
            (
                collapsed.repartition(nparts, F.col("_bucket"))
                .withColumn("_ccls", F.ntile(int(k)).over(w))
                .sortWithinPartitions("_bucket", "_ccls", *cluster_by, "url")
                .write.mode("errorifexists")
                .partitionBy("_ccls", "_bucket")
                .parquet(out_abs)
            )
        else:
            (
                collapsed.repartition(nparts, F.col("_bucket"))
                .sortWithinPartitions("url")
                .write.mode("errorifexists")
                .partitionBy("_bucket")
                .parquet(out_abs)
            )
        new_files = _walk_bucket_files(
            self.path,
            out_rel,
            man.get("key_blooms", False),
            stat_cols=tuple(cluster_by or ()),
        )
        if ft < nb:
            for f in new_files:
                f["bmod"] = ft
        bundle = _SideBundle(
            os.path.join("metadata", f"commit-{man['table_uuid'][:8]}-{commit_id}.json")
        )
        file_groups = self._advance_file_groups(
            man, commit_id, bucket_set, new_files, bundle
        )
        if bundle.members:
            self._write_side_json(bundle.rel_path, bundle.members)
        new_man = {
            **man,
            "version": version,
            "file_groups": file_groups,
            "parent": man["version"],
            "summary": {
                "commit_id": commit_id,
                "kind": "compaction",
                "buckets": sorted(bucket_set),
                "files_written": len(new_files),
                **({"cluster_by": cluster_by} if cluster_by else {}),
            },
            "lineage": [],
        }
        new_man.pop("files", None)  # legacy inline list superseded by groups
        try:
            self._write_manifest(new_man)
        except FileExistsError:
            # same wedge merge recovers from: ahead-of-HEAD debris at our
            # target version. Clear and retry once; if HEAD actually moved
            # (live writer — out of compact's single-writer contract),
            # surface the collision.
            if not self._clear_unpublished_manifest(version):
                raise
            self._write_manifest(new_man)
        return {"version": version, "commit_id": commit_id, "buckets": sorted(bucket_set)}

    def maybe_compact(self, spark: SparkSession, max_files_per_bucket: int = 8):
        """Compact every bucket whose live file count exceeds the bound —
        keeps MoR scan cost O(max_files_per_bucket) per bucket."""
        over = [
            b for b, n in self.bucket_file_counts().items() if n > max_files_per_bucket
        ]
        return self.compact(spark, sorted(over))

    # --------------------------------------------------- partition evolution
    def rebucket(self, spark: SparkSession, new_n_buckets: int) -> dict[str, Any] | None:
        """Partition-spec evolution: rewrite the table from
        ``bucket(n_buckets, url)`` to ``bucket(new_n_buckets, url)`` in one
        snapshot commit (the Iceberg partition-spec-evolution analog for
        this layout — except eager: the hash-bucket spec is load-bearing
        for merge's touched-bucket selection and lookup's pruning, so a
        lazy two-spec table would make every keyed read scan both specs;
        one rewrite commit keeps those paths single-spec and O(1/buckets)).

        Logical state is UNTOUCHED: the rewrite is the MoR-collapsed
        relation (one LWW winner per url, tombstones and ``_cdc_seq``
        carried) re-hashed into the new bucket space, so ``state_hash`` is
        bit-identical across the commit. The epoch LEDGER is carried
        forward verbatim — replay resumed after a rebucket skips exactly
        the epochs it would have skipped before (exactly-once survives
        spec evolution, same contract as compaction). Subsequent merges
        read ``n_buckets`` from the head manifest per call, so the next
        epoch applies on the new spec with no caller change.

        Ops shape at 100 TB: this is the ONE deliberately full-table
        job in the engine (every url changes bucket residue when the
        modulus changes — no incremental spec migration exists that keeps
        keyed pruning exact), sized/scheduled like a full compaction:
        one shuffle on the new bucket id, adaptive file fanout, and the
        snapshot flip is O(1) metadata. Grow buckets when per-bucket
        bytes outgrow executor memory; shrink when trickle epochs smear
        into too-small files."""
        man = self.manifest()
        if new_n_buckets < 1:
            raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
        if new_n_buckets == man["n_buckets"]:
            return None
        version = man["version"] + 1
        commit_id = "b" + _stable_hash(
            f"{man['table_uuid']}:rebucket:{version}:{new_n_buckets}"
        )
        out_rel = os.path.join("data", commit_id)
        out_abs = os.path.join(self.path, out_rel)
        if os.path.exists(out_abs):
            import shutil

            shutil.rmtree(out_abs)
        files_in = self._files(man)
        est_rows = sum(int(f.get("rows") or 0) for f in files_in) or None
        collapsed = self.scan_internal(spark).withColumn(
            "_bucket", bucket_expr("url", new_n_buckets)
        )
        ft = self._write_modulus(new_n_buckets, est_rows)
        if ft < new_n_buckets:
            collapsed = collapsed.withColumn(
                "_bucket", F.pmod(F.col("_bucket"), F.lit(ft))
            )
        nparts = max(
            1,
            min(ft if ft < new_n_buckets else new_n_buckets,
                spark.sparkContext.defaultParallelism),
        )
        (
            collapsed.repartition(nparts, F.col("_bucket"))
            .sortWithinPartitions("url")
            .write.mode("errorifexists")
            .partitionBy("_bucket")
            .parquet(out_abs)
        )
        new_files = _walk_bucket_files(self.path, out_rel, man.get("key_blooms", False))
        if ft < new_n_buckets:
            for f in new_files:
                f["bmod"] = ft
        # the bucket->group mapping changes with the modulus, so file_groups
        # is REBUILT (not advanced): every non-empty group is a fresh member
        # of this commit's side bundle
        n_groups = min(FILE_GROUPS_MAX, new_n_buckets)
        bundle = _SideBundle(
            os.path.join("metadata", f"commit-{man['table_uuid'][:8]}-{commit_id}.json")
        )
        by_group: dict[int, list[dict]] = {}
        for f in new_files:
            by_group.setdefault(f["bucket"] % n_groups, []).append(f)
        groups: dict[str, dict] = {}
        for g, fs in sorted(by_group.items()):
            fs = sorted(fs, key=lambda f: (f["bucket"], f["path"]))
            groups[str(g)] = {
                "ref": bundle.add(f"files-g{g}", fs),
                "n_files": len(fs),
                "bytes": sum(f["bytes"] for f in fs),
            }
        if bundle.members:
            self._write_side_json(bundle.rel_path, bundle.members)
        new_man = {
            **man,
            "version": version,
            "n_buckets": new_n_buckets,
            "file_groups": {"n_groups": n_groups, "groups": groups},
            "parent": man["version"],
            "summary": {
                "commit_id": commit_id,
                "kind": "rebucket",
                "n_buckets_old": man["n_buckets"],
                "n_buckets_new": new_n_buckets,
                "files_written": len(new_files),
            },
            "lineage": [],
        }
        new_man.pop("files", None)  # legacy inline list superseded by groups
        try:
            self._write_manifest(new_man)
        except FileExistsError:
            if not self._clear_unpublished_manifest(version):
                raise
            self._write_manifest(new_man)
        return {
            "version": version,
            "commit_id": commit_id,
            "n_buckets_old": man["n_buckets"],
            "n_buckets_new": new_n_buckets,
            "files_written": len(new_files),
        }

    # ------------------------------------------------------------- expiry
    @staticmethod
    def _ref_path(ref) -> str:
        return ref if isinstance(ref, str) else ref["path"]

    def referenced_paths(self, version: int) -> set[str]:
        """Every table-relative path manifest ``version`` depends on to stay
        readable: its data files, side bundles holding its file groups, and
        its ledger index+segment chain."""
        man = self.manifest(version)
        refs: set[str] = set()
        if "files" in man:  # legacy inline list
            refs.update(f["path"] for f in man["files"])
        else:
            for g in man["file_groups"]["groups"].values():
                refs.add(self._ref_path(g.get("ref") or g["path"]))
            refs.update(f["path"] for f in self._files(man))
        spill = man.get("ledger_spill") or {}
        idx_ref = self._spill_index_ref(spill)
        if idx_ref:
            refs.add(self._ref_path(idx_ref))
            index = self._resolve_ref(idx_ref)
            refs.update(self._ref_path(s.get("ref") or s["path"]) for s in index["segments"])
        return refs

    def expire_snapshots(self, keep_last: int = 10, vacuum: bool = True) -> dict[str, int]:
        """Iceberg ``expire_snapshots`` + ``remove_orphan_files`` analog —
        the retention half of the O(1)-metadata story (without it, old
        manifests and superseded data files accumulate forever).

        Deletes manifest files older than the newest ``keep_last`` versions,
        then (``vacuum``) deletes every data file and metadata side file no
        retained manifest references. Exactly-once is UNAFFECTED: the HEAD
        manifest's ledger (inline window + spilled segment chain) is always
        retained, so ``ledger_entry`` still recognizes every committed epoch
        after expiry. Time travel to an expired version raises
        FileNotFoundError. TAGGED versions are retained regardless of age
        (tags are the retention pins). Single-writer assumption (same as
        merge)."""
        head = self.head_version()
        lo = max(0, head - keep_last + 1)
        tagged = set(self.tags().values())
        retained = [
            v
            for v in range(head + 1)
            if (v >= lo or v in tagged) and os.path.isfile(self._manifest_path(v))
        ]
        refs: set[str] = set()
        for v in retained:
            refs.update(self.referenced_paths(v))

        expired = 0
        for v in range(lo):
            if v in tagged:
                continue
            mp = self._manifest_path(v)
            if os.path.isfile(mp):
                os.remove(mp)
                expired += 1

        removed_data = removed_meta = 0
        if vacuum:
            for dirpath, _dirs, names in os.walk(self.data_dir):
                for n in names:
                    rel = os.path.relpath(os.path.join(dirpath, n), self.path)
                    if n.endswith(".parquet") and rel not in refs:
                        os.remove(os.path.join(dirpath, n))
                        removed_data += 1
            # prune now-empty commit/bucket dirs (cosmetic, keeps walks fast)
            for dirpath, dirs, names in os.walk(self.data_dir, topdown=False):
                if not dirs and not names and dirpath != self.data_dir:
                    os.rmdir(dirpath)
            keep_names = {"HEAD"} | {f"v{v:08d}.json" for v in retained}
            for n in os.listdir(self.meta_dir):
                rel = os.path.join("metadata", n)
                if n in keep_names or rel in refs or n.startswith(".HEAD"):
                    continue
                if n.startswith(("commit-", "ledger-", "files-")) and n.endswith(".json"):
                    os.remove(os.path.join(self.meta_dir, n))
                    removed_meta += 1
        return {
            "expired_manifests": expired,
            "removed_data_files": removed_data,
            "removed_side_files": removed_meta,
            "retained_versions": len(retained),
        }

    # ---------------------------------------------------- ledger / lineage
    def ledger_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                e["epoch_id"],
                e["commit_id"],
                e["first_seq"],
                e["last_seq"],
                datetime.fromisoformat(e["committed_at"]).replace(tzinfo=None),
            )
            for _, e in sorted(self.committed_epochs().items())
        ]
        return spark.createDataFrame(rows, _LEDGER_SCHEMA)

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """All RETAINED epochs' lineage, reconstructed from the manifest
        chain (each manifest atomically carries its own epoch's rows; the
        chain stops at the expiry horizon — export_metrics before expiring
        if full-history lineage must outlive snapshot retention)."""
        rows: list[tuple] = []
        v: int | None = self.head_version()
        while v is not None:
            try:
                man = self.manifest(v)
            except FileNotFoundError:
                break  # older snapshots expired
            for r in man.get("lineage", []):
                # .get: manifests written before a lineage column was added
                # simply surface NULL for it
                rows.append(tuple(r.get(f.name) for f in _LINEAGE_SCHEMA.fields))
            v = man["parent"]
        return spark.createDataFrame(rows, _LINEAGE_SCHEMA)

    def export_metrics(self, spark: SparkSession, out_dir: str) -> None:
        """Materialize the offset ledger + per-partition lineage as parquet
        tables (the queryable 'metrics table' form of BASELINE.json:6; the
        authoritative copies stay inside the atomic manifests)."""
        self.ledger_df(spark).write.mode("overwrite").parquet(os.path.join(out_dir, "ledger"))
        self.lineage_df(spark).write.mode("overwrite").parquet(os.path.join(out_dir, "lineage"))

    # -------------------------------------------------------- verification
    def state_hash(self, spark: SparkSession, version: int | None = None) -> tuple[int, int]:
        """(row_count, order-insensitive content hash) of live user rows (A6).

        Deterministic function of logical table state — the byte-identical
        replay check (BASELINE.json:6).
        """
        df = self.scan(spark, version)
        cols = [F.col(c) for c in df.columns]
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(r["n"]), int(r["h"])


def _naive_utc(d):
    """Footer stats may come back tz-aware; store/compare naive UTC."""
    if hasattr(d, "tzinfo") and d.tzinfo is not None:
        return d.astimezone(timezone.utc).replace(tzinfo=None)
    return d


def _stable_hash(s: str) -> str:
    import hashlib

    return hashlib.sha256(s.encode()).hexdigest()[:16]


# ---- per-file key bloom filters (opt-in, SnapLake.create(key_blooms=True))
# 10 bits/key + k=7 double hashing ~= 0.8% fpp; m capped so one entry's
# metadata stays bounded (fpp degrades gracefully past the cap, never
# incorrect). Stored zlib+base64 in the file entry, which lives in the
# commit's SIDE BUNDLE — the root manifest stays O(1) bytes (Iceberg
# analog: puffin blob referenced from the manifest entry).
_KBLOOM_BITS_PER_KEY = 10
_KBLOOM_K = 7
_KBLOOM_MAX_BITS = 1 << 21  # 256 KiB of bits per file


def _kbloom_hashes(url: str, m: int) -> list[int]:
    import hashlib as _hl

    d = _hl.md5(url.encode()).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(_KBLOOM_K)]


def _kbloom_build(urls) -> dict | None:
    """Bloom dict for a file's url column (any iterable of str)."""
    import base64
    import zlib

    urls = list(urls)
    if not urls:
        return None
    m = max(64, min(_KBLOOM_MAX_BITS, _KBLOOM_BITS_PER_KEY * len(urls)))
    bits = bytearray((m + 7) // 8)
    for u in urls:
        for g in _kbloom_hashes(u, m):
            bits[g >> 3] |= 1 << (g & 7)
    return {
        "m": m,
        "k": _KBLOOM_K,
        "bits": base64.b64encode(zlib.compress(bytes(bits), 6)).decode(),
    }


def _kbloom_may_contain(entry: dict, url: str, _cache: dict | None = None) -> bool:
    """True unless the entry's bloom PROVES url absent. Entries without a
    bloom (legacy files, blooms disabled) are never pruned. ``_cache``
    (entry-path -> decoded bitset) amortizes the zlib decode across the
    urls of one lookup."""
    kb = entry.get("kbloom")
    if not kb:
        return True
    key = entry["path"]
    if _cache is not None and key in _cache:
        bits = _cache[key]
    else:
        import base64
        import zlib

        bits = zlib.decompress(base64.b64decode(kb["bits"]))
        if _cache is not None:
            _cache[key] = bits
    m = kb["m"]
    return all(bits[g >> 3] & (1 << (g & 7)) for g in _kbloom_hashes(url, m))


def _kbloom_prune(files: list[dict], urls: list[str]) -> list[dict]:
    """Keep the files whose bloom may contain ANY of the urls (files
    without a bloom always kept). Pure metadata — no file opens."""
    cache: dict = {}
    return [
        f for f in files if any(_kbloom_may_contain(f, u, cache) for u in urls)
    ]


def _footer_stats(
    root: str,
    ap: str,
    bucket: int,
    with_bloom: bool = False,
    stat_cols: tuple[str, ...] = (),
) -> dict:
    """One file's manifest entry: rows/bytes + warc_ts min/max from parquet
    footer statistics, so time-bounded scans prune whole files without
    opening them — the manifest-level analog of Iceberg's days(warc_ts)
    partition pruning, composable with the url-hash bucket pruning.
    ``with_bloom`` additionally reads the url COLUMN (one columnar IO on a
    file this writer just produced, same GIL-released thread pool) and
    attaches a key bloom so point lookups prune to the files that may
    actually hold a key. On a real cluster this build would ride the write
    job executor-side; driver-threadpool matches the footer-harvest
    pattern and is opt-in so the benched ingest path is unchanged."""
    md = pq.ParquetFile(ap).metadata
    ts_lo = ts_hi = None
    try:
        idx = md.schema.names.index("warc_ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ts_lo = ts_hi = None
                break
            lo, hi = _naive_utc(st.min), _naive_utc(st.max)
            ts_lo = lo if ts_lo is None else min(ts_lo, lo)
            ts_hi = hi if ts_hi is None else max(ts_hi, hi)
    except ValueError:
        pass
    out = {
        "path": os.path.relpath(ap, root),
        "bucket": bucket,
        "rows": md.num_rows,
        "bytes": os.path.getsize(ap),
        "ts_min": None if ts_lo is None else ts_lo.isoformat(),
        "ts_max": None if ts_hi is None else ts_hi.isoformat(),
    }
    cstats: dict[str, list] = {}
    for c in stat_cols:
        try:
            idx = md.schema.names.index(c)
        except ValueError:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            rlo, rhi = st.min, st.max
            if not isinstance(rlo, (str, int, float)) or isinstance(rlo, bool):
                lo = hi = None
                break  # only JSON-portable scalar types carry manifest stats
            lo = rlo if lo is None else min(lo, rlo)
            hi = rhi if hi is None else max(hi, rhi)
        if lo is not None:
            cstats[c] = [lo, hi]
    if cstats:
        out["cstats"] = cstats
    if with_bloom and md.num_rows and "url" in md.schema.names:
        col = pq.read_table(ap, columns=["url"]).column("url")
        kb = _kbloom_build(u.as_py() for u in col)
        if kb is not None:
            out["kbloom"] = kb
    return out


def _walk_bucket_files(
    root: str,
    rel_dir: str,
    with_blooms: bool = False,
    stat_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Collect parquet files written under data/<commit>/_bucket=K/.

    Footer harvesting is a thread pool, not a serial loop: pyarrow releases
    the GIL on footer reads and each read is a small independent IO, so at
    n_buckets in the hundreds-to-thousands the per-commit stats pass stays
    a constant few tens of ms instead of scaling linearly with file count
    on the driver (round-2 verdict finding #2)."""
    targets: list[tuple[str, int]] = []
    base = os.path.join(root, rel_dir)
    for dirpath, _dirs, names in os.walk(base):
        bname = os.path.basename(dirpath)
        if not bname.startswith("_bucket="):
            continue
        bucket = int(bname.split("=", 1)[1])
        targets.extend(
            (os.path.join(dirpath, n), bucket)
            for n in sorted(names)
            if n.endswith(".parquet")
        )
    if len(targets) <= 4:
        out = [_footer_stats(root, ap, b, with_blooms, stat_cols) for ap, b in targets]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(targets))) as ex:
            out = list(
                ex.map(lambda t: _footer_stats(root, *t, with_blooms, stat_cols), targets)
            )
    return sorted(out, key=lambda f: (f["bucket"], f["path"]))
