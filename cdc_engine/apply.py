"""apply_epoch: the whole CDC apply for one micro-batch (SURVEY.md §3.1).

Pure function of (batch contents, epoch_id, lake state): normalize ->
validate/quarantine -> LWW dedup -> salted repartition -> MERGE (which
atomically commits data + ledger + lineage). Both the streaming path
(foreachBatch) and the deterministic replay path call exactly this.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_engine.config import CdcConfig
from cdc_engine.dedup import lww_dedup
from cdc_engine.lake import SnapLake
from cdc_engine.normalize import apply_mapping
from cdc_engine.salt import bucket_expr, salted_repartition


def apply_epoch(
    spark: SparkSession,
    lake: SnapLake,
    batch_df: DataFrame,
    epoch_id: int,
    cfg: CdcConfig | None = None,
    quarantine_dir: str | None = None,
) -> dict[str, Any] | None:
    """Apply one epoch; returns commit stats, or None if the epoch was
    already committed / the batch is empty (both are safe no-ops)."""
    cfg = cfg or CdcConfig()
    if str(epoch_id) in lake.manifest()["ledger"]:
        return None  # idempotence fast-path before any Spark work (J4)

    df = apply_mapping(batch_df, cfg.column_mapping)

    # P4: null-safe key guard — LWW is undefined for null url/warc_ts/seq
    valid = F.col("url").isNotNull() & F.col("warc_ts").isNotNull() & F.col("seq").isNotNull()
    if cfg.quarantine_invalid:
        bad = df.where(~valid)
        if quarantine_dir is not None:
            bad.write.mode("append").parquet(os.path.join(quarantine_dir, f"epoch={epoch_id}"))
        df = df.where(valid)

    # ONE pre-dedup aggregate job computes everything the commit needs from
    # the raw batch: per-source-partition input stats (ledger/lineage must
    # record the FULL consumed offset range, not just LWW winners — S6/S7),
    # emptiness, and the set of touched lake buckets (saves merge a separate
    # distinct-buckets job). Deliberately NARROW: seq, source_partition and
    # the url hash only — lineage byte accounting comes from the cached
    # deduped winners inside merge, so the wide html column is never scanned
    # twice (a full extra pass over ~80% of the batch bytes otherwise).
    n_buckets = lake.manifest()["n_buckets"]
    sp = F.col("source_partition").cast("int") if "source_partition" in df.columns else F.lit(None).cast("int")
    stats_rows = (
        df.groupBy(sp.alias("pid"))
        .agg(
            F.count("*").alias("rows_in"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
            F.collect_set(bucket_expr("url", n_buckets)).alias("buckets"),
        )
        .collect()
    )
    if not stats_rows:
        return None
    input_stats = [
        {
            "partition_id": None if r["pid"] is None else int(r["pid"]),
            "rows_in": int(r["rows_in"]),
            "first_seq": int(r["first_seq"]),
            "last_seq": int(r["last_seq"]),
            "bytes": None,  # filled by merge from the cached winners
        }
        for r in stats_rows
    ]
    touched = sorted({int(b) for r in stats_rows for b in r["buckets"]})

    # W1: one row per url — MUST precede merge (multiple source matches per
    # target row would make the merge nondeterministic; SURVEY.md §4 inv. 1)
    df = lww_dedup(
        df,
        key="url",
        ts="warc_ts",
        seq="seq",
        strategy=cfg.dedup_strategy,
        salt_buckets=cfg.salt_buckets,
    )

    # J6: optional explicit pre-merge shuffle on hash(url); the dedup above
    # already leaves the batch hash-partitioned on url, so default is off
    if cfg.repartition_urls:
        df = salted_repartition(df, "url", cfg.repartition_urls)

    # cache the deduped batch: the merge's write job and its lineage stats
    # job both consume it (otherwise dedup's shuffle re-runs per job)
    df = df.persist()
    try:
        return lake.merge(
            spark, df, epoch_id, input_stats=input_stats, touched_buckets=touched
        )
    finally:
        df.unpersist()
