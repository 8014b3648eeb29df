#!/usr/bin/env python
"""spark-submit entry point (BASELINE.json:14 "packaged for spark-submit
--py-files on a multi-executor cluster").

Cluster usage:
    python package.py                      # builds dist/cdc_engine.zip
    spark-submit --py-files dist/cdc_engine.zip main.py ingest \\
        --wal /data/wal --lake /data/pages --checkpoint /ckpt/pages \\
        --n-buckets 4096 --mode mor --tail

Sandbox usage (local[N] master comes from the session builder):
    python main.py replay --wal /tmp/wal --lake /tmp/lake

Subcommands:
    ingest   — Structured Streaming tail (availableNow by default; --tail
               runs forever on a processing-time trigger)
    replay   — deterministic bounded replay by seq-range epochs (resumes
               from the ledger automatically)
    compact  — fold merge-on-read delta files back into base files
    expire   — expire old snapshots + vacuum unreferenced files
    status   — print snapshot version, ledger range, file/bucket stats
    neardup  — near-duplicate survivorship over a documents parquet
               (LSH -> exact Jaccard -> connected components -> keep
               min doc_id per cluster)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_engine import CdcConfig, SnapLake, ingest_stream, replay
from cdc_engine.schemas import PAGES_SCHEMA_V1
from cdc_engine.session import build_session


def _lake(args) -> SnapLake:
    if SnapLake.exists(args.lake):
        lake = SnapLake(args.lake)
        stored = lake.manifest().get("mode", "cow")
        if stored != args.mode:
            print(
                f"warning: lake {args.lake} was created with mode={stored}; "
                f"--mode {args.mode} is ignored (table mode is a create-time "
                f"property)",
                file=sys.stderr,
            )
        return lake
    return SnapLake.create(
        args.lake, PAGES_SCHEMA_V1, n_buckets=args.n_buckets, mode=args.mode,
        key_blooms=getattr(args, "key_blooms", False),
    )


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="cdc_engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--lake", required=True)
        p.add_argument("--n-buckets", type=int, default=64)
        p.add_argument("--mode", choices=("cow", "mor"), default="mor")
        p.add_argument("--events-per-epoch", type=int, default=100_000)
        p.add_argument("--compact-after-files", type=int, default=8)
        p.add_argument("--master", default=None)
        p.add_argument(
            "--quarantine-dir",
            default=None,
            help="where rows with null url/warc_ts/seq are persisted "
            "(default: <lake>/quarantine; they are always counted in lineage)",
        )
        p.add_argument(
            "--key-blooms", action="store_true",
            help="create-time table property: attach a per-file url bloom "
            "to every written file so `lookup` prunes file-granular "
            "(write-path cost: one url-column read per written file)",
        )

    p = sub.add_parser("ingest")
    common(p)
    p.add_argument("--wal", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tail", action="store_true", help="run forever (processing-time trigger)")
    p.add_argument("--max-files-per-trigger", type=int, default=1)

    p = sub.add_parser("replay")
    common(p)
    p.add_argument("--wal", required=True)
    p.add_argument("--max-epochs", type=int, default=None)

    p = sub.add_parser("compact")
    common(p)
    p.add_argument("--cluster-by", default=None,
                   help="comma-separated columns: range-split each bucket's "
                   "files contiguous in this order and record per-file "
                   "min/max stats so scan(col_bounds=...) prunes whole "
                   "files (Iceberg sort-order / OPTIMIZE ZORDER analog)")
    p.add_argument("--files-per-bucket", type=int, default=None,
                   help="cluster fanout override (default: per-bucket rows "
                   "/ 100k, clamped to [1, 64])")

    # partition-spec evolution: rewrite to a new url-hash bucket count in
    # one snapshot commit (state hash + ledger carried; replay resumes
    # exactly-once on the new spec)
    p = sub.add_parser("rebucket")
    p.add_argument("--lake", required=True)
    p.add_argument("--to-buckets", type=int, required=True,
                   help="new bucket count; grow when per-bucket bytes "
                   "outgrow executor memory, shrink when trickle epochs "
                   "smear into too-small files")
    p.add_argument("--verify", action="store_true",
                   help="state_hash the table before AND after the "
                   "rewrite and fail if they differ (two extra "
                   "full-table scans)")
    p.add_argument("--master", default=None)

    p = sub.add_parser("expire")
    common(p)
    p.add_argument("--keep-last", type=int, default=10,
                   help="retain this many newest snapshots; older manifests "
                   "are deleted and unreferenced data/side files vacuumed "
                   "(the ledger always survives — exactly-once is unaffected)")
    p.add_argument("--no-vacuum", action="store_true",
                   help="expire manifests only; keep orphaned files on disk")

    p = sub.add_parser("status")
    common(p)

    # destructive snapshot rollback (metadata-only; the ledger rolls back
    # too, so replaying the same WAL re-applies the undone epochs)
    p = sub.add_parser("rollback")
    p.add_argument("--lake", required=True)
    p.add_argument("--to-version", required=True,
                   help="version number or tag name to return HEAD to")
    p.add_argument("--master", default=None)

    # point read: current rows for a set of keys (bucket- and, with
    # key_blooms, file-pruned; version/tag time travel)
    p = sub.add_parser("lookup")
    p.add_argument("--lake", required=True)
    p.add_argument("--urls", required=True, help="comma-separated url keys")
    p.add_argument("--version", default=None,
                   help="version number or tag name (default: head)")
    p.add_argument("--master", default=None)

    # metadata integrity audit (exit 1 on errors)
    p = sub.add_parser("fsck")
    p.add_argument("--lake", required=True)
    p.add_argument("--deep", action="store_true",
                   help="also open every live parquet footer (row counts "
                   "vs manifest, bloom decodability)")
    p.add_argument("--master", default=None)

    # named snapshot refs: pin (default), list, or drop
    p = sub.add_parser("tag")
    p.add_argument("--lake", required=True)
    p.add_argument("--name", default=None,
                   help="tag to create/drop; omit to list tags")
    p.add_argument("--version", type=int, default=None, help="default: head")
    p.add_argument("--drop", action="store_true")
    p.add_argument("--master", default=None)

    # change data feed between two snapshots (CDC out, Delta CDF analog)
    p = sub.add_parser("changes")
    p.add_argument("--lake", required=True)
    p.add_argument("--from-version", type=int, required=True)
    p.add_argument("--to-version", type=int, default=None,
                   help="default: head")
    p.add_argument("--out", default=None,
                   help="write the feed to this parquet; omit for counts only")
    p.add_argument("--master", default=None)

    # incrementally-maintained materialized GROUP BY over the lake
    p = sub.add_parser("mview")
    p.add_argument("--lake", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--group-cols", required=True,
                   help="comma-separated grouping columns")
    p.add_argument("--sum-cols", default="",
                   help="comma-separated columns to SUM (count(*) is always kept)")
    p.add_argument("--full", action="store_true",
                   help="force a full refresh instead of incremental catch-up")
    p.add_argument("--out", default=None,
                   help="also write the finalized view to this parquet")
    p.add_argument("--master", default=None)

    # near-dup survivorship over a documents table (the training-data
    # pipeline side of the engine): LSH candidates -> exact Jaccard ->
    # connected components -> keep min(doc_id) per cluster
    p = sub.add_parser("neardup")
    p.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    p.add_argument("--out", required=True, help="output parquet of surviving docs")
    p.add_argument("--method", choices=("minhash", "simhash"), default="minhash",
                   help="candidate generation: minhash-LSH + exact Jaccard "
                        "(default) or banded SimHash Hamming")
    p.add_argument("--k", type=int, default=24, help="minhash signature length")
    p.add_argument("--band-rows", type=int, default=8, help="rows per LSH band")
    p.add_argument("--threshold-milli", type=int, default=900,
                   help="near-dup Jaccard threshold in 1/1000 units")
    p.add_argument("--bands", type=int, default=4,
                   help="simhash: disjoint bit bands over the 48-bit fingerprint")
    p.add_argument("--max-hamming", type=int, default=3,
                   help="simhash: keep pairs within this Hamming distance "
                        "(exact recall requires max-hamming < bands)")
    p.add_argument("--survivor-policy", choices=("min-id", "longest"),
                   default="min-id",
                   help="per-cluster keep rule: smallest doc_id (default) "
                        "or the longest member (ties -> smallest doc_id)")
    p.add_argument("--master", default=None)

    # end-to-end corpus curation: PII scrub -> exact dedup -> near dedup ->
    # Gopher-style quality funnel -> split assignment, one command
    # (cdc_engine/curate.py; every stage is an independently oracle-checked
    # operator)
    p = sub.add_parser("curate")
    p.add_argument("--docs", required=True, help="parquet with (doc_id, text, ...)")
    p.add_argument("--out", required=True,
                   help="output dir: curated parquet partitioned by split")
    p.add_argument("--no-neardup", action="store_true",
                   help="skip the minhash-LSH near-dup stage")
    p.add_argument("--state", default=None,
                   help="INCREMENTAL mode: curate --docs as ONE CDC epoch "
                        "against this standing state dir (hash table, LSH "
                        "index, component labels), appending it; first call "
                        "on an empty dir bootstraps. Writes the epoch's "
                        "survivors to --out and bridged-component "
                        "retractions to <out>_retractions")
    p.add_argument("--k", type=int, default=8, help="minhash signature length")
    p.add_argument("--band-rows", type=int, default=4, help="rows per LSH band "
                   "(4 = the de-degenerated r6 contract setting; 2-token bands "
                   "keep ~85% of all pairs on self-similar corpora)")
    p.add_argument("--threshold-milli", type=int, default=600,
                   help="near-dup Jaccard threshold in 1/1000 units")
    p.add_argument("--min-words", type=int, default=25,
                   help="quality funnel r1 lower word bound (tune per corpus)")
    p.add_argument("--max-words", type=int, default=90,
                   help="quality funnel r1 upper word bound (tune per corpus)")
    p.add_argument("--val-permille", type=int, default=100)
    p.add_argument("--test-permille", type=int, default=100)
    p.add_argument("--master", default=None)

    # plan audit: print the physical plan of any contract query — the
    # .explain() surface as a first-class CLI verb
    p = sub.add_parser("explain")
    p.add_argument("--query", required=True,
                   help="contract query name, or 'list' to enumerate")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--plan-mode", default="formatted",
                   choices=("simple", "extended", "formatted", "cost", "codegen"))
    p.add_argument("--master", default=None)

    args = ap.parse_args(argv)
    spark = build_session(f"cdc_engine-{args.cmd}", master=args.master)
    if args.cmd not in ("neardup", "changes", "mview", "rollback", "tag", "fsck", "lookup", "explain", "rebucket", "curate"):
        cfg = CdcConfig(
            events_per_epoch=args.events_per_epoch,
            n_buckets=args.n_buckets,
            compact_after_files=args.compact_after_files,
            quarantine_dir=(
                args.quarantine_dir
                if args.quarantine_dir is not None
                else os.path.join(args.lake, "quarantine")
            ),
        )

    if args.cmd == "ingest":
        lake = _lake(args)
        ingest_stream(
            spark, lake, args.wal, checkpoint_dir=args.checkpoint, cfg=cfg,
            available_now=not args.tail,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        n, h = lake.state_hash(spark)
        print(json.dumps({"version": lake.head_version(), "rows": n, "state_hash": h}))
    elif args.cmd == "replay":
        lake = _lake(args)
        results = replay(spark, lake, args.wal, cfg, max_epochs=args.max_epochs)
        n, h = lake.state_hash(spark)
        print(json.dumps({
            "epochs_applied": len(results), "version": lake.head_version(),
            "rows": n, "state_hash": h,
        }))
    elif args.cmd == "compact":
        lake = SnapLake(args.lake)
        cluster = [c for c in (args.cluster_by or "").split(",") if c] or None
        r = lake.compact(
            spark, sorted(lake.bucket_file_counts()),
            cluster_by=cluster, cluster_files_per_bucket=args.files_per_bucket,
        )
        print(json.dumps(r or {}))
    elif args.cmd == "rebucket":
        lake = SnapLake(args.lake)
        before = lake.state_hash(spark) if args.verify else None
        r = lake.rebucket(spark, args.to_buckets)
        n2, h2 = lake.state_hash(spark)
        # explicit raise, not assert: must survive `python -O`
        if before is not None and before != (n2, h2):
            raise RuntimeError(
                f"rebucket changed logical state: {before} -> {(n2, h2)}"
            )
        print(json.dumps({**(r or {"noop": True}), "rows": n2, "state_hash": h2}))
    elif args.cmd == "expire":
        lake = SnapLake(args.lake)
        r = lake.expire_snapshots(keep_last=args.keep_last, vacuum=not args.no_vacuum)
        print(json.dumps(r))
    elif args.cmd == "changes":
        from pyspark.sql import functions as F

        lake = SnapLake(args.lake)
        to_v = args.to_version if args.to_version is not None else lake.head_version()
        feed = lake.changes(spark, args.from_version, to_v)
        if args.out:
            feed.write.mode("errorifexists").parquet(args.out)
            feed = spark.read.parquet(args.out)
        by_type = {
            r["change_type"]: r["n"]
            for r in feed.groupBy("change_type").agg(F.count("*").alias("n")).collect()
        }
        print(json.dumps({
            "from_version": args.from_version, "to_version": to_v,
            "changes": sum(by_type.values()),
            "inserts": by_type.get("insert", 0),
            "updates": by_type.get("update", 0),
            "deletes": by_type.get("delete", 0),
        }))
    elif args.cmd == "mview":
        from cdc_engine.mview import AggSpec, IncrementalAggView

        lake = SnapLake(args.lake)
        specs = [AggSpec("n", "count")] + [
            AggSpec(f"sum_{c}", "sum", c)
            for c in args.sum_cols.split(",") if c
        ]
        mv = IncrementalAggView(
            lake, args.name, [c for c in args.group_cols.split(",") if c], specs
        )
        st = mv.full_refresh(spark) if args.full else mv.incremental_refresh(spark)
        if args.out:
            mv.df(spark).write.mode("errorifexists").parquet(args.out)
        st["groups"] = mv.df(spark).count()
        print(json.dumps(st))
    elif args.cmd == "neardup":
        from pyspark.sql import functions as F

        from cdc_engine.dedup_text import (
            connected_components,
            jaccard_on_lsh,
            simhash_candidate_pairs,
        )

        docs = spark.read.parquet(args.docs)
        if args.method == "simhash":
            pairs = simhash_candidate_pairs(
                docs, bands=args.bands, max_hamming=args.max_hamming
            )
        else:
            pairs = jaccard_on_lsh(
                docs, k=args.k, band_rows=args.band_rows,
                threshold_milli=args.threshold_milli,
            )
        comps = connected_components(pairs, src="da", dst="db")
        if args.survivor_policy == "longest":
            from cdc_engine.dedup_text import quality_survivors

            docs_q = (
                docs
                if "n_chars" in docs.columns
                else docs.withColumn("n_chars", F.length("text"))
            )
            dropped = quality_survivors(comps, docs_q).where(
                ~F.col("is_survivor")
            )
        else:
            dropped = comps.where(F.col("node") != F.col("component"))
        survivors = docs.join(
            dropped, docs["doc_id"] == dropped["node"], "left_anti"
        )
        survivors.write.mode("errorifexists").parquet(args.out)
        n_docs = docs.count()
        n_out = spark.read.parquet(args.out).count()
        print(json.dumps({
            "docs_in": n_docs,
            "survivors": n_out,
            "dropped": n_docs - n_out,
            "clusters": comps.select("component").distinct().count(),
        }))
    elif args.cmd == "curate":
        from cdc_engine.curate import curate, curate_incremental

        docs = spark.read.parquet(args.docs)
        kw = dict(
            neardup=not args.no_neardup,
            k=args.k,
            band_rows=args.band_rows,
            threshold_milli=args.threshold_milli,
            min_words=args.min_words,
            max_words=args.max_words,
            val_permille=args.val_permille,
            test_permille=args.test_permille,
        )
        if args.state:
            curated, retractions, report = curate_incremental(
                spark, docs, args.state, **kw
            )
            retractions.write.mode("errorifexists").parquet(
                args.out.rstrip("/") + "_retractions"
            )
            retractions.unpersist()
        else:
            curated, report = curate(docs, **kw)
        curated.write.mode("errorifexists").partitionBy("split").parquet(args.out)
        curated.unpersist()
        print(json.dumps(report))
    elif args.cmd == "explain":
        from cdc_engine.contract import QUERIES

        if args.query == "list":
            print("\n".join(QUERIES))
        else:
            QUERIES[args.query](spark, args.sf_dir).explain(mode=args.plan_mode)
    elif args.cmd == "rollback":
        lake = SnapLake(args.lake)
        try:
            target: int | str = int(args.to_version)
        except ValueError:
            target = args.to_version  # tag name
        r = lake.rollback(target)
        print(json.dumps(r))
    elif args.cmd == "lookup":
        lake = SnapLake(args.lake)
        version: int | str | None = args.version
        if version is not None:
            try:
                version = int(version)
            except ValueError:
                pass  # tag name
        rows = lake.lookup(
            spark, [u for u in args.urls.split(",") if u], version=version
        ).collect()
        for row in rows:
            print(json.dumps(row.asDict(), default=str))
        print(json.dumps({"found": len(rows)}))
    elif args.cmd == "fsck":
        lake = SnapLake(args.lake)
        r = lake.fsck(deep=args.deep)
        print(json.dumps(r))
        if not r["ok"]:
            spark.stop()
            raise SystemExit(1)
    elif args.cmd == "tag":
        lake = SnapLake(args.lake)
        if args.name is None:
            print(json.dumps(lake.tags()))
        elif args.drop:
            lake.drop_tag(args.name)
            print(json.dumps({"dropped": args.name, "tags": lake.tags()}))
        else:
            v = lake.tag(args.name, args.version)
            print(json.dumps({"tag": args.name, "version": v}))
    elif args.cmd == "status":
        lake = SnapLake(args.lake)
        man = lake.manifest()
        epochs = sorted(lake.committed_epochs())
        counts = lake.bucket_file_counts()
        print(json.dumps({
            "version": man["version"],
            "mode": man.get("mode", "cow"),
            "schema": [f.name for f in lake.schema().fields],
            "epochs": [epochs[0], epochs[-1]] if epochs else [],
            "files": sum(counts.values()),
            "max_files_per_bucket": max(counts.values()) if counts else 0,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
