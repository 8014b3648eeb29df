"""Count-Min Sketch heavy hitters [Cormode & Muthukrishnan 2005].

The exact heavy-hitter path (salt.topk_heavy_hitters) shuffles the full
key space; at 100 TB an ops dashboard often wants FIXED-memory frequency
estimates instead — the CMS is d x w counters (here 4 x 64 = 256 cells)
no matter how many distinct keys exist, mergeable across partitions and
across time windows by cell-wise addition (the counter build is one
map-side-combinable hash aggregate over d rows per event).

Determinism: the d hash functions are md5-derived (row j's column for a
key is the first 8 hex chars of md5("j:key") mod w) — no RNG, so the
sketch, and therefore the estimate, is bit-identical in any engine; the
DuckDB oracle rebuilds the same counters and must match exactly. The CMS
guarantee est >= exact (one-sided error) is asserted per row."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cms_col(j: int, key):
    """Column index of ``key`` in counter row j: md5-derived, engine-portable."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
    )


def cms_counters(df: DataFrame, key: str, d: int = 4, w: int = 64) -> DataFrame:
    """(j, col, n): the d x w counter matrix — ONE hash aggregate over an
    in-row explode of the d hash rows; at most d*w output rows regardless
    of input size or key cardinality."""
    rows = df.select(
        F.posexplode(
            F.array(*[(_cms_col(j, F.col(key)) % w).alias(f"c{j}") for j in range(d)])
        ).alias("j", "col")
    )
    return rows.groupBy("j", "col").agg(F.count("*").cast("long").alias("n"))


def cms_heavy_hitters(
    df: DataFrame, key: str, d: int = 4, w: int = 64, k: int = 20
) -> DataFrame:
    """Exact top-k keys with their CMS estimate alongside the true count:
    (key, exact_n, cms_est, overcount) where overcount = cms_est - exact_n >= 0 by
    the CMS one-sided guarantee. The exact side exists to ORACLE the
    sketch — a production scan would keep only the 256-cell counter
    relation and probe it. The counter relation broadcasts (d*w rows);
    the probe is d broadcast lookups + a min — never a shuffle of the
    key space beyond the exact top-k itself."""
    counters = cms_counters(df, key, d=d, w=w)
    top = (
        df.groupBy(F.col(key).alias("key"))
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
        .limit(k)
    )
    probes = top.select(
        "key",
        "exact_n",
        F.posexplode(
            F.array(*[(_cms_col(j, F.col("key")) % w) for j in range(d)])
        ).alias("j", "col"),
    )
    est = (
        probes.join(F.broadcast(counters), ["j", "col"])
        .groupBy("key", "exact_n")
        .agg(F.min("n").cast("long").alias("cms_est"))
    )
    return est.select(
        "key",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overcount"),
    )
