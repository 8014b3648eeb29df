"""Deterministic sampling / split assignment for training-data pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed-deterministic only
within one Spark version and partitioning — useless for a reproducible
holdout on a living 100 TB corpus. These operators derive membership from
a content-stable md5 hash of the KEY, so:

  * the same document lands in the same split forever, across engines,
    versions, partitionings, and re-ingests (no train/test leakage when
    the corpus grows);
  * everything is pure Catalyst expressions on a narrow scan — no RNG
    state, no shuffle for the assignment itself;
  * DuckDB reproduces every decision bit-for-bit (md5-derived, like every
    other cross-engine hash in this repo).

Bucket = md5_48(key) mod 1000 (per-mille). Stratified rates are exact in
expectation per stratum and deterministic per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def permille_bucket(col, salt: str = ""):
    """Stable per-mille bucket 0..999 from md5 of (salt + key)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(1000))


def dataset_splits(
    df: DataFrame,
    key: str = "doc_id",
    val_permille: int = 100,
    test_permille: int = 100,
    salt: str = "split:",
) -> DataFrame:
    """(key, bucket, split) with split in {train, val, test}: the holdout
    assignment every training pipeline needs, stable under re-ingest."""
    b = permille_bucket(F.col(key), salt)
    split = (
        F.when(b < test_permille, "test")
        .when(b < test_permille + val_permille, "val")
        .otherwise("train")
    )
    return df.select(
        F.col(key), b.cast("int").alias("bucket"), split.alias("split")
    )


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    stratum: str = "lang",
    key: str = "doc_id",
    default_permille: int = 0,
    salt: str = "sample:",
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its per-mille bucket
    falls below its stratum's rate (e.g. {'en': 100, 'de': 500} keeps 10%
    of English and 50% of German docs — the oversample/downsample mix step
    of corpus curation)."""
    b = permille_bucket(F.col(key), salt)
    rate = F.lit(default_permille)
    for s, r in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum) == s, F.lit(r)).otherwise(rate)
    return df.where(b < rate)
