"""T2/T3/T4: watermarked streaming operators (SURVEY.md §2.9).

The engine's authoritative duplicate/late-data guard is the LWW MERGE
condition plus the epoch ledger (duplicate deliveries are harmless replays
— SURVEY.md T3); these operators are the literal streaming forms for the
metrics plane and for transport-level hygiene:

  * windowed_metrics — tumbling event-time windows over the change stream
    (events/ops per window), bounded by a watermark so state is finite at
    10^10-event scale.
  * drop_exact_redeliveries — dropDuplicatesWithinWatermark on the WAL
    offset: sheds transport-level re-sends of the SAME offset before they
    cost a merge. Semantic duplicates (same payload re-enqueued under a
    new seq) are left to the LWW merge, which is the only component that
    can decide them correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_metrics(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(event-time window, op) arrival counts + url cardinality sketch.

    Watermark bounds the aggregation state: windows older than the
    watermark finalize and evict (late events beyond it are dropped from
    METRICS only — the lake path never drops them, see T5)."""
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("op"))
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("url", 0.02).alias("approx_urls"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op", "n", "approx_urls", "first_seq", "last_seq",
        )
    )


def drop_exact_redeliveries(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T3: shed exact WAL-offset re-deliveries within the watermark."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["seq"])
