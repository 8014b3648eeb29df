"""J6: salted repartitioning on hash(url) for hot-domain skew (SURVEY.md §2.3).

A Common-Crawl CDC tail is zipf-skewed by domain; partitioning raw events by
domain (or by Spark's default partitioner on a low-cardinality key) melts a
few reducers. We always shuffle on pmod(xxhash64(url), P) — the full url, not
the domain, so a hot domain's pages spread across partitions — and expose a
skew probe that measures achieved balance (it doubles as the lineage skew
sensor, SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucket_expr(key_col: str, n: int):
    """Deterministic bucket id: pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n))


def salted_repartition(df: DataFrame, key_col: str = "url", num_partitions: int = 32) -> DataFrame:
    """Repartition by hashed key so downstream per-partition work balances."""
    return df.repartition(num_partitions, bucket_expr(key_col, num_partitions))


def partition_balance(df: DataFrame, key_col: str = "url", num_partitions: int = 32):
    """(max/mean, sizes) of the partition histogram the salted shuffle yields.

    Coefficient used by tests: perfectly balanced -> 1.0; a hot-key melt
    shows up as max/mean >> 1.
    """
    sizes = (
        df.select(bucket_expr(key_col, num_partitions).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    mean = sum(counts) / max(len(counts), 1)
    return (max(counts) / mean if mean else 0.0), counts
