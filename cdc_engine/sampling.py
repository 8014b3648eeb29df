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


def split_column(col, val_permille: int = 100, test_permille: int = 100,
                 salt: str = "split:"):
    """The split-assignment EXPRESSION (train/val/test string column) —
    usable inline via withColumn, so a pipeline that already carries the
    key needn't self-join against dataset_splits' narrow projection."""
    b = permille_bucket(col, salt)
    return (
        F.when(b < test_permille, "test")
        .when(b < test_permille + val_permille, "val")
        .otherwise("train")
    )


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
    split = split_column(F.col(key), val_permille, test_permille, salt)
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


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    range_width: int = 128,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Deterministic concat-and-chunk sequence packing: lay the corpus
    end-to-end in key order and cut fixed-capacity token bins — the
    GPT-style pre-training batch assembly step (a doc's bin is the bin
    containing its START offset). Returns one row per bin:
    (bin_id, n_docs, n_tokens, first_doc, last_doc).

    The naive formulation is a GLOBAL cumulative sum — a single-task
    window at 100 TB. This is the scalable two-pass prefix sum instead:

      pass 1: hash-aggregate token sums per contiguous key range
              (floor(key / range_width)) — map-side combinable;
      pass 2: the per-range offsets relation is tiny (corpus_rows /
              range_width rows), so its own cumsum runs as one trivially
              small single-partition window, then BROADCASTS back; each
              range computes its intra-range cumsum in parallel
              (window partitioned by range) and adds its offset.

    Every wide step is keyed on the range bucket; the only global
    ordering lives in the tiny offsets relation. Token counts use the
    shared whitespace tokenizer (textops/repetition_stats) so the DuckDB
    oracle is exact."""
    from pyspark.sql import Window

    n_tok = F.size(
        F.filter(F.split(F.col(text), r"\s+"), lambda x: x != F.lit(""))
    ).cast("long")
    base = docs.select(
        F.col(key),
        n_tok.alias("n_tok"),
        F.floor(F.col(key) / range_width).cast("long").alias("rb"),
    )
    rng_sum = base.groupBy("rb").agg(F.sum("n_tok").alias("rb_tok"))
    w_off = Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = rng_sum.select(
        "rb", F.coalesce(F.sum("rb_tok").over(w_off), F.lit(0)).alias("rb_off")
    )
    w_in = (
        Window.partitionBy("rb")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.join(F.broadcast(offsets), "rb").select(
        F.col(key),
        F.col("n_tok"),
        (F.col("rb_off") + F.coalesce(F.sum("n_tok").over(w_in), F.lit(0))).alias(
            "start_off"
        ),
    )
    return (
        placed.select(
            F.col(key),
            F.col("n_tok"),
            F.floor(F.col("start_off") / capacity).cast("long").alias("bin_id"),
        )
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min(key).alias("first_doc"),
            F.max(key).alias("last_doc"),
        )
    )


def mixture_weights(
    docs: DataFrame, stratum: str = "source", text: str = "text"
) -> DataFrame:
    """Corpus mixture statistics + temperature-resampling weights per
    stratum (source/domain/language): the knob every pre-training run
    turns to keep a giant crawl from drowning small high-quality domains.
    tau=2 temperature sampling: weight proportional to sqrt(token share)
    — rare domains are upsampled relative to their raw share, the
    standard multilingual/multi-domain mitigation.

    Cross-engine exactness: shares and weights are floor-milli-quantized
    INTEGER ratios. sqrt is IEEE-correctly-rounded in both engines and is
    taken of an exact bigint, then floored to a bigint BEFORE the ratio,
    so no engine-ordered float summation ever happens.

    Shape (the 100 TB story): ONE hash aggregate on the stratum (map-side
    combinable; stratum cardinality is tiny — tens of domains), then all
    ratio math runs on the tiny per-stratum relation against a broadcast
    1-row totals relation. The corpus is scanned once, two columns."""
    n_tok = F.size(
        F.filter(F.split(F.col(text), r"\s+"), lambda x: x != F.lit(""))
    ).cast("long")
    per = docs.groupBy(stratum).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
    ).withColumn("sqrt_q", F.floor(F.sqrt(F.col("n_tokens"))).cast("long"))
    totals = per.agg(
        F.sum("n_tokens").alias("_tot_tok"), F.sum("sqrt_q").alias("_tot_sqrt")
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            stratum,
            "n_docs",
            "n_tokens",
            F.floor(F.lit(1000) * F.col("n_tokens") / F.col("_tot_tok"))
            .cast("long")
            .alias("share_milli"),
            F.floor(F.lit(1000) * F.col("sqrt_q") / F.col("_tot_sqrt"))
            .cast("long")
            .alias("weight_milli"),
        )
    )


def stratified_topn(
    df: DataFrame, stratum: str = "source", key: str = "doc_id", n: int = 50
) -> DataFrame:
    """Deterministic per-stratum top-n subsample: rank rows inside each
    stratum by the content-stable md5 of the key (the same hash family as
    dataset_splits, so membership never moves) and keep the first n.
    The exact-count companion to stratified_sample's rate-based filter —
    use it when the recipe says "exactly 10k docs per language".

    One window shuffle keyed on the stratum; the hash order makes the
    pick independent of partitioning, ingestion order, and engine."""
    from pyspark.sql import Window

    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= n)
        .select(stratum, key, "rank")
    )


def corpus_shuffle(
    docs: DataFrame, seed: str = "s0", key: str = "doc_id"
) -> DataFrame:
    """Deterministic global corpus shuffle — the training-data ordering
    step: every row gets a stable position 0..N-1 in md5(seed:key) order,
    reproducible run-to-run and engine-to-engine (no RNG state; reshuffle
    = change the seed string).

    The naive formulation is row_number() over a GLOBAL order — a
    single-task window at 100 TB. This is the same two-pass distributed
    prefix sum as pack_sequences: bucket by the hash's first byte
    (256 contiguous hash ranges), count per bucket, cumsum the tiny
    256-row offsets relation, then each bucket computes its intra-bucket
    rank in parallel (window partitioned by bucket) and adds its offset.
    The only global ordering lives in the 256-row relation; everything
    wide is keyed on the bucket — at any scale the plan is one hash agg,
    one broadcast, one partitioned sort."""
    from pyspark.sql import Window

    hkey = F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    base = docs.select(
        F.col(key),
        hkey.alias("hk"),
        F.conv(F.substring(hkey, 1, 2), 16, 10).cast("long").alias("hb"),
    )
    counts = base.groupBy("hb").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "hb", F.coalesce(F.sum("n").over(w_off), F.lit(0)).cast("long").alias("off")
    )
    w_in = Window.partitionBy("hb").orderBy("hk", key)
    return (
        base.join(F.broadcast(offsets), "hb")
        .select(
            F.col(key),
            (F.col("off") + F.row_number().over(w_in) - 1).cast("long").alias("pos"),
        )
    )
