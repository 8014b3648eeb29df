"""Incrementally-maintained materialized aggregate views over a SnapLake.

At 100 TB, "recompute the dashboard GROUP BY after every ingest epoch" is
a full-table scan per epoch — the single most wasteful recurring job in a
CDC warehouse. This module maintains a keyed aggregate table (the classic
self-maintainable view: COUNT(*), COUNT(col), SUM(col) — AVG derives from
SUM/COUNT on read) that advances from lake version A to lake version B by
scanning ONLY the buckets whose file sets changed between the two
manifests, at BOTH versions, via the lake's snapshot time travel:

    delta(g) = agg(live rows @B restricted to touched buckets)
             - agg(live rows @A restricted to touched buckets)
    MV(B)    = MV(A) (+) delta

The telescoping trick: consecutive epoch deltas over the SAME bucket
cancel through intermediate versions, so ANY number of epochs behind is
caught up with exactly two bounded scans (head + synced version) over the
union of touched buckets — never one scan per epoch, never a full-table
scan. Touched buckets come from a pure-metadata diff of the two manifests'
sharded file groups (group refs compared first; only groups whose ref
changed resolve their file lists). MoR compaction commits that rewrite
files without changing state produce a delta of exact zeros and fall out
in the merge.

Routing is cost-based: with url-hash bucketing an epoch of k distinct
keys touches ~min(k, n_buckets) buckets, and the delta reads touched
buckets at BOTH versions — so past touched = n_buckets/2 a plain
recompute reads less, and ``incremental_refresh(route='auto')`` takes it.
The incremental path's 100 TB win case is the operational norm: trickle
epochs and near-real-time view freshness, where touched << n_buckets.

Scope (documented, not hidden): only retraction-capable aggregates.
MIN/MAX are NOT self-maintainable under deletes (losing the current min
requires rescanning the group) and are rejected at construction. SUM over
floating-point columns is maintained but inherits float non-associativity
vs a recompute; integral SUMs are exact. A SUM whose group loses all its
non-null inputs returns to NULL (not 0): each sum spec carries a hidden
non-null counter used to finalize, so incremental == full recompute.

Spec parity: the reference snapshot ships no code (SURVEY.md §0.1); the
capability modeled here is the Iceberg/Delta "incremental MV refresh over
table snapshots" pattern (SURVEY.md §2.14), built on SnapLake's
time-travel scan (lake.py scan_internal) and sharded file-group manifests
(lake.py _advance_file_groups).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_engine.lake import SnapLake
from cdc_engine.salt import bucket_expr
from cdc_engine.schemas import INTERNAL_DELETED

_N = "_mv_n"  # hidden live-row count per group: group liveness + COUNT(*)


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: ``fn`` in {'count', 'sum'}; ``col`` is
    None for COUNT(*). Output column is ``name``."""

    name: str
    fn: str
    col: str | None = None

    def __post_init__(self):
        if self.fn not in ("count", "sum"):
            raise ValueError(
                f"{self.fn}: only self-maintainable aggregates (count/sum) "
                "can be incrementally maintained under deletes; min/max "
                "need a group rescan on retraction"
            )
        if self.fn == "sum" and self.col is None:
            raise ValueError("sum needs a column")


class IncrementalAggView:
    """A named materialized GROUP BY over ``lake``, stored as a tiny
    versioned parquet + meta.json under ``<lake>/mview/<name>/`` (outside
    data/ and metadata/, so expire_snapshots' vacuum never touches it)."""

    def __init__(
        self,
        lake: SnapLake,
        name: str,
        group_cols: list[str],
        specs: list[AggSpec],
        path: str | None = None,
    ):
        if not specs:
            raise ValueError("at least one AggSpec")
        names = [s.name for s in specs]
        if len(set(names)) != len(names) or set(names) & set(group_cols):
            raise ValueError("spec output names must be unique, disjoint from group cols")
        self.lake = lake
        self.name = name
        self.group_cols = list(group_cols)
        self.specs = list(specs)
        self.path = path or os.path.join(lake.path, "mview", name)
        os.makedirs(self.path, exist_ok=True)

    # ------------------------------------------------------------- storage
    def _meta(self) -> dict | None:
        p = os.path.join(self.path, "meta.json")
        if not os.path.isfile(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _write_meta(self, meta: dict) -> None:
        p = os.path.join(self.path, "meta.json")
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, p)

    def _state_dir(self, mv_version: int) -> str:
        return os.path.join(self.path, f"state_v{mv_version:06d}.parquet")

    # ------------------------------------------------------- agg plumbing
    def _counter_cols(self) -> list[str]:
        cols = [_N]
        for s in self.specs:
            cols.append(s.name)
            if s.fn == "sum":
                cols.append(f"_mv_nn_{s.name}")
        return cols

    def _weighted_agg(self, df: DataFrame, weight: int) -> DataFrame:
        """Aggregate ``df`` (live rows) into signed counter rows."""
        w = F.lit(int(weight))
        aggs = [F.sum(w).alias(_N)]
        for s in self.specs:
            if s.fn == "count" and s.col is None:
                aggs.append(F.sum(w).alias(s.name))
            elif s.fn == "count":
                aggs.append(
                    F.sum(F.when(F.col(s.col).isNotNull(), w).otherwise(F.lit(0))).alias(s.name)
                )
            else:  # sum: signed value sum + signed non-null count (finalizer)
                aggs.append(F.sum(w * F.col(s.col)).alias(s.name))
                aggs.append(
                    F.sum(F.when(F.col(s.col).isNotNull(), w).otherwise(F.lit(0))).alias(
                        f"_mv_nn_{s.name}"
                    )
                )
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _live_at(self, spark: SparkSession, version: int, buckets: set[int] | None) -> DataFrame:
        """Live (tombstone-filtered) rows at ``version``, row-exact to the
        bucket set: class files over-read their residue class, so the scan
        is re-filtered on the recomputed url bucket — over-read rows appear
        identically at both versions otherwise and would still cancel, but
        exact filtering keeps the delta scan minimal and provable."""
        man = self.lake.manifest(version)
        df = self.lake.scan_internal(spark, version, buckets=buckets)
        df = df.where(~F.col(INTERNAL_DELETED))
        if buckets is not None:
            df = df.where(bucket_expr("url", man["n_buckets"]).isin([int(b) for b in buckets]))
        # schema evolution: an older version may predate a spec/group column
        need, have = set(self.group_cols), set(df.columns)
        for s in self.specs:
            if s.col:
                need.add(s.col)
        missing = sorted(need - have)
        if missing:
            head_schema = self.lake.schema()  # head types are authoritative
            by_name = {f.name: f.dataType for f in head_schema.fields}
            unknown = [c for c in missing if c not in by_name]
            if unknown:
                # not schema evolution: the column is absent from the head
                # schema too (e.g. a rollback landed below the commit that
                # added it) — same failure as SQL aggregating a column the
                # table doesn't have
                raise ValueError(
                    f"view {self.name} references column(s) {unknown} not in "
                    f"the lake schema at v{self.lake.head_version()}"
                )
            for c in missing:
                df = df.withColumn(c, F.lit(None).cast(by_name[c]))
        return df.select(*sorted(need))

    # ------------------------------------------------------------ refresh
    def full_refresh(self, spark: SparkSession, version: int | None = None) -> dict:
        v = self.lake.head_version() if version is None else version
        state = self._weighted_agg(self._live_at(spark, v, None), +1).where(F.col(_N) > 0)
        return self._commit_state(spark, state, v, mode="full", touched=None)

    def incremental_refresh(self, spark: SparkSession, route: str = "auto") -> dict:
        """Advance the view from its synced lake version to head with two
        touched-bucket scans. Falls back to full_refresh when the synced
        manifest has been expired, predates sharded file groups, or
        (``route='auto'``) when the touched-bucket delta would read more
        than a recompute; ``route='incremental'`` forces the delta path
        (tests / correctness proofs)."""
        if route not in ("auto", "incremental"):
            raise ValueError(f"route: {route}")
        meta = self._meta()
        if meta is None:
            return self.full_refresh(spark)
        v0, head = meta["synced_version"], self.lake.head_version()
        if head == v0:
            return {"mode": "noop", "synced_version": v0, "mv_version": meta["mv_version"]}
        if head < v0:
            # the lake was rolled back below the synced snapshot — the
            # incremental ledger of deltas is void; rebuild from the
            # rolled-back state (same contract as an expired sync point)
            return self.full_refresh(spark)
        try:
            man_old = self.lake.manifest(v0)
        except FileNotFoundError:
            return self.full_refresh(spark)  # synced snapshot expired
        man_new = self.lake.manifest(head)
        touched = self.lake.touched_buckets_between(v0, head)
        if touched is None:
            return self.full_refresh(spark)
        # cost-based route: the delta reads the touched buckets at BOTH
        # versions (2 x touched/n_buckets of the table) while a full
        # recompute reads the table once — with url-hash bucketing, an
        # epoch of k distinct urls touches ~min(k, n_buckets) buckets, so
        # a fat or scattered catch-up is cheaper recomputed. Break even at
        # touched = n_buckets/2; prefer full at or past it.
        if route == "auto" and 2 * len(touched) >= man_new["n_buckets"]:
            return self.full_refresh(spark)
        stats = {
            "mode": "incremental",
            "from_version": v0,
            "touched_buckets": len(touched),
            "n_buckets": man_new["n_buckets"],
            "files_scanned_old": len(self.lake._files(man_old, touched)) if touched else 0,
            "files_scanned_new": len(self.lake._files(man_new, touched)) if touched else 0,
            "files_total_new": len(self.lake._files(man_new)),
        }
        prior = spark.read.parquet(self._state_dir(meta["mv_version"]))
        if not touched:  # metadata-only commits (ledger spill, expiry)
            out = self._commit_state(spark, prior, head, **{"mode": "incremental"})
            out.update(stats)
            return out
        new = self._weighted_agg(self._live_at(spark, head, touched), +1)
        old = self._weighted_agg(self._live_at(spark, v0, touched), -1)
        cols = self.group_cols + self._counter_cols()
        merged = (
            prior.select(*cols)
            .unionByName(new.select(*cols))
            .unionByName(old.select(*cols))
            .groupBy(*self.group_cols)
            .agg(*[F.sum(c).alias(c) for c in self._counter_cols()])
            .where(F.col(_N) > 0)
        )
        out = self._commit_state(spark, merged, head, mode="incremental")
        out.update(stats)
        return out

    def _commit_state(self, spark, state: DataFrame, lake_version: int, mode: str, **_) -> dict:
        meta = self._meta()
        mv_version = (meta["mv_version"] + 1) if meta else 1
        dest = self._state_dir(mv_version)
        cols = self.group_cols + self._counter_cols()
        state.select(*cols).coalesce(1).write.mode("overwrite").parquet(dest)
        self._write_meta({"synced_version": lake_version, "mv_version": mv_version})
        if meta:  # reclaim the superseded state (single-writer, like the lake)
            old = self._state_dir(meta["mv_version"])
            if os.path.isdir(old):
                import shutil

                shutil.rmtree(old, ignore_errors=True)
        return {"mode": mode, "synced_version": lake_version, "mv_version": mv_version}

    # --------------------------------------------------------------- read
    def df(self, spark: SparkSession) -> DataFrame:
        """Current view contents, finalized: COUNT specs as-is, SUM specs
        NULLed when the group holds no non-null inputs (matches SQL SUM)."""
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError(f"view {self.name} never refreshed")
        st = spark.read.parquet(self._state_dir(meta["mv_version"]))
        cols = [F.col(c) for c in self.group_cols]
        for s in self.specs:
            if s.fn == "sum":
                cols.append(
                    F.when(F.col(f"_mv_nn_{s.name}") > 0, F.col(s.name)).alias(s.name)
                )
            else:
                cols.append(F.col(s.name))
        return st.select(*cols)
