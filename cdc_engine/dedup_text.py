"""Document deduplication operators (training-data pipeline):

  * exact dedup        — md5 content hash, hash-groupBy (one shuffle)
  * n-gram Jaccard     — token-set overlap via explode + self-join on token,
                         blocked by lang to bound the candidate space
  * MinHash + LSH      — k md5-derived minhashes, banded into LSH buckets,
                         bucket-join for candidate pairs
  * SimHash            — 48-bit similarity hash via a vectorized pandas UDF

Scale notes (the 100 TB story):
  - exact dedup is a single hash aggregate with map-side combine;
  - Jaccard's token self-join is quadratic in posting-list length — the
    lang (or any) blocking key caps it; at web scale you'd block on LSH
    buckets from the MinHash stage instead (lsh_candidate_pairs does
    exactly that: candidates are pairs sharing a band bucket, so the join
    is on the bucket key, never all-pairs);
  - all hashes are md5-derived so the DuckDB oracles reproduce them
    bit-for-bit (engine-native xxhash64 would not be checkable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from cdc_engine.textops import tokens_expr

# 48-bit hash from the first 12 hex chars of md5 — cross-engine reproducible
def _md5_48(col):
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """(n_docs, n_unique) by exact content hash."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


def doc_tokens(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, lang, token) — the shared shingle relation."""
    return (
        docs.select("doc_id", "lang", F.explode(tokens_expr()).alias("w"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold_milli: int = 300) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard >= threshold (milli-units),
    blocked by lang. Returns (da, db, inter, na, nb, jacc_milli)."""
    tok = doc_tokens(docs)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    out = (
        inter.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select(
            "da",
            "db",
            "inter",
            F.col("sa.n").alias("na"),
            F.col("sb.n").alias("nb"),
            F.round(
                F.lit(1000.0) * F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
            )
            .cast("long")
            .alias("jacc_milli"),
        )
    )
    return out.where(F.col("jacc_milli") >= threshold_milli).orderBy("da", "db")


def minhash_signatures(docs: DataFrame, k: int = 8) -> DataFrame:
    """k MinHash values per doc: sig_i = min over tokens of
    md5_48(concat(i, ':', token)). Returns (doc_id, i, minhash)."""
    tok = doc_tokens(docs).select("doc_id", "w")
    hashes = tok.crossJoin(F.broadcast(
        tok.sparkSession.range(k).select(F.col("id").cast("int").alias("i"))
    ))
    h = _md5_48(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("w")))
    return (
        hashes.groupBy("doc_id", "i")
        .agg(F.min(h).alias("minhash"))
        .orderBy("doc_id", "i")
    )


def lsh_candidate_pairs(docs: DataFrame, k: int = 8, band_rows: int = 2) -> DataFrame:
    """LSH: band the k-row signature into k/band_rows bands; docs sharing
    ANY band bucket are candidates. The join is on (band, band_key) —
    never all-pairs. Returns distinct (da, db)."""
    sig = minhash_signatures(docs, k)
    banded = (
        # floor, not cast: DuckDB CAST(double AS INT) rounds, Spark truncates
        sig.withColumn("band", F.floor(F.col("i") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_key")
        )
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .distinct()
        .orderBy("da", "db")
    )


@pandas_udf(T.LongType())
def simhash48(text: pd.Series) -> pd.Series:
    """48-bit SimHash over word tokens (vectorized batch; md5-derived token
    hashes so results are platform-stable)."""
    import hashlib
    import re

    tok_re = re.compile(r"[^a-z0-9]+")

    def one(t: str | None) -> int | None:
        if t is None:
            return None
        acc = np.zeros(48, dtype=np.int64)
        for w in set(filter(None, tok_re.split(t.lower()))):
            h = int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
            bits = (h >> np.arange(48)) & 1
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(48):
            if acc[i] > 0:
                out |= 1 << i
        return out

    return text.map(one)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", simhash48(F.col("text")).alias("simhash")).orderBy("doc_id")
