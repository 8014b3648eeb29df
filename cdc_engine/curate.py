"""End-to-end corpus curation: the single pass a webtext training-data
pipeline runs between "raw crawl" and "training shards", composed entirely
from this engine's already-verified operators (each independently
oracle-checked by the driver contract):

  1. PII scrub        (textops.pii_scrub — before any dedup, so redaction
                       markers don't perturb near-dup signatures)
  2. exact dedup      (dedup_text.exact_dedup_canonical — one window min
                       over the content hash)
  3. near dedup       (minhash-LSH -> exact Jaccard rescore -> O(log n)
                       connected components -> min-id survivor; optional)
  4. quality funnel   (textops.quality_funnel — Gopher-style staged rules,
                       retention loss attributed per stage)
  5. split assignment (sampling.dataset_splits — content-stable md5
                       per-mille holdout, stable under re-ingest)

Scale shape: every stage is the respective operator's documented 100 TB
shape (keyed shuffles on content hash / band keys, never all-pairs; pure
Catalyst expressions; bounded star-contraction rounds). The orchestration
itself adds NO new shuffles beyond its stages: survivors are carried as
left-anti joins on doc_id, and the funnel report is one groupBy over the
first-fail label. All report numbers are bounded aggregates — the corpus
never reaches the driver.

The composition intentionally matches the public recipe lineage
(C4/Gopher/RefinedWeb): scrub -> dedup (exact then fuzzy) -> quality ->
holdout. SPEC parity: the graft cell's payload is webtext
[SPEC BASELINE.json graft_cell]; this verb is the one-command form of the
webtext training-data pass built from the §2.11-2.14 operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    docs: DataFrame,
    *,
    neardup: bool = True,
    k: int = 8,
    band_rows: int = 2,
    threshold_milli: int = 600,
    min_words: int = 25,
    max_words: int = 90,
    val_permille: int = 100,
    test_permille: int = 100,
) -> tuple[DataFrame, dict]:
    """Run the five-stage curation pipeline over (doc_id, text, ...) docs.

    Returns (curated, report): ``curated`` keeps every input column except
    that ``text`` is the scrubbed text, plus ``split`` — ready for
    ``.write.partitionBy("split")``; ``report`` is a JSON-able dict of
    funnel counts.

    Reporting rides the pipeline's OWN jobs: each persisted stage is
    materialized by exactly one count() (the count IS that stage's report
    number), and every other scalar (PII sums, per-rule funnel counts,
    curated word total, split sizes) is an ``Observation`` attached to a
    node those same jobs already execute — so a full curate() run is
    three bounded actions (scrub+exact-dedup, near-dup, finalize) plus the
    components loop's own rounds; no report entry re-runs a corpus-sized
    stage. Each Observation sits on a node referenced exactly once in the
    job that fires it (a twice-referenced subtree would double-count its
    CollectMetrics accumulator)."""
    from pyspark.sql import Observation

    from cdc_engine.dedup_text import (
        connected_components,
        exact_dedup_canonical,
        jaccard_on_lsh,
    )
    from cdc_engine.sampling import split_column
    from cdc_engine.textops import pii_scrub, quality_funnel

    report: dict = {}

    # 1. PII scrub: replace text with the redacted form. The redaction
    # counts ride the materialization job as an Observation (attached
    # BELOW the persist, single-referenced until the count fires it).
    scrubbed = pii_scrub(docs, col="text")
    base_cols = [c for c in docs.columns if c != "text"]
    obs_pii = Observation("curate_pii")
    docs1 = scrubbed.observe(
        obs_pii,
        F.sum("n_emails").alias("e"),
        F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
    ).select(*base_cols, F.col("clean_text").alias("text"))

    # The near-dup chain re-reads the doc relation several times (tokens,
    # signatures, candidate rescore) — cache the scrubbed corpus once for
    # the duration of the pipeline. At cluster scale this is a
    # MEMORY_AND_DISK materialization of the post-scrub corpus, the same
    # checkpointing a production multi-stage pipeline does between passes.
    persisted: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        persisted.append(df.persist())
        return df

    docs1 = _persist(docs1)
    try:
        report["docs_in"] = docs1.count()  # job 1: scrub + cache + obs_pii
        pii = obs_pii.get
        report["pii_redactions"] = {
            "emails": int(pii["e"] or 0),
            "ips": int(pii["i"] or 0),
            "phones": int(pii["p"] or 0),
        }

        # 2. Exact dedup: keep the canonical (min doc_id) member per
        # identical-content group — one keyed shuffle on md5(text).
        canon = exact_dedup_canonical(docs1)
        docs2 = docs1.join(
            canon.where(F.col("is_dup")).select(F.col("doc_id").alias("_drop")),
            docs1["doc_id"] == F.col("_drop"),
            "left_anti",
        )
        docs2 = _persist(docs2)
        report["after_exact_dedup"] = docs2.count()  # job 2 (from docs1 cache)

        # 3. Near dedup (optional): LSH candidates -> Jaccard >= threshold
        # -> connected components -> drop non-canonical members.
        if neardup:
            pairs = jaccard_on_lsh(
                docs2, k=k, band_rows=band_rows, threshold_milli=threshold_milli
            )
            comps = connected_components(pairs, src="da", dst="db")
            dropped = comps.where(F.col("node") != F.col("component"))
            docs3 = docs2.join(
                dropped, docs2["doc_id"] == dropped["node"], "left_anti"
            )
            docs3 = _persist(docs3)
            report["after_near_dedup"] = docs3.count()
        else:
            docs3 = docs2
            report["after_near_dedup"] = report["after_exact_dedup"]

        # 4+5. Quality funnel + holdout assignment, ONE finalize job:
        # per-rule loss attribution and the curated word total observe the
        # funnel relation (referenced once, via keep), split sizes observe
        # the top-level curated relation; split assignment is an inline
        # expression on doc_id — no self-join.
        fun_stages = ("r1_len", "r2_wordlen", "r3_stop", "r4_punct", "r5_ttr", "pass")
        obs_fun = Observation("curate_funnel")
        fun = quality_funnel(docs3, min_words=min_words, max_words=max_words).observe(
            obs_fun,
            *[
                F.sum(F.when(F.col("first_fail") == s, 1).otherwise(0)).alias(s)
                for s in fun_stages
            ],
            F.sum(F.when(F.col("passed") == 1, F.col("n_words"))).alias("_nw"),
        )
        keep = fun.where(F.col("passed") == 1).select("doc_id")
        obs_split = Observation("curate_splits")
        curated = (
            docs3.join(keep, "doc_id")
            .withColumn(
                "split",
                split_column(
                    F.col("doc_id"),
                    val_permille=val_permille,
                    test_permille=test_permille,
                ),
            )
            .observe(
                obs_split,
                *[
                    F.sum(F.when(F.col("split") == s, 1).otherwise(0)).alias(s)
                    for s in ("train", "val", "test")
                ],
            )
        )
        # materialize the result before unpersisting its inputs; curated
        # stays cached for the caller's write
        curated = curated.persist()
        curated.count()  # finalize job: funnel + join + split + both obs
        funnel_counts = obs_fun.get
        report["funnel"] = {s: int(funnel_counts[s] or 0) for s in fun_stages}
        report["after_quality"] = report["funnel"]["pass"]
        report["n_words_curated"] = int(funnel_counts["_nw"] or 0)
        sp = obs_split.get
        report["splits"] = {
            s: int(sp[s]) for s in ("train", "val", "test") if int(sp[s] or 0)
        }
    finally:
        for df in persisted:
            df.unpersist()
    return curated, report
