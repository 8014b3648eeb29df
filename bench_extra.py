#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): isolate each expensive query /
sub-stage with the noop sink so we time the computation, not the sink, and
capture .explain("formatted") per step. NOT part of the driver contract —
bench.py stays the frozen measurement; numbers from here are cited in
OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py [step ...]        # default: all steps
  SPARK_GRAFT_SF_DIR=... to change corpus (default /root/testdata/sf0.1)
  CDC_PLANS_DIR=plans/r07 CDC_PLANS_TAG=before to also dump plans
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_engine.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.environ.get("CDC_PLANS_DIR")
PLANS_TAG = os.environ.get("CDC_PLANS_TAG", "plan")
REPEATS = int(os.environ.get("CDC_BENCH_EXTRA_REPEATS", "2"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _steps(spark):
    from pyspark.sql import functions as F

    from cdc_engine.contract import QUERIES
    from cdc_engine.dedup_text import (
        banded_signatures,
        connected_components,
        doc_tokens,
        jaccard_on_lsh,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def rescored_df():
        cand = lsh_candidate_pairs(docs, k=24, band_rows=8)
        pre = docs.select("doc_id", F.substring("text", 1, 64).alias("p"))
        a, b = pre.alias("a"), pre.alias("b")
        return (
            cand.join(a, F.col("da") == F.col("a.doc_id"))
            .join(b, F.col("db") == F.col("b.doc_id"))
            .select(
                "da", "db",
                F.levenshtein(F.col("a.p"), F.col("b.p"), 16).alias("prefix_edit"),
            )
            .where(F.col("prefix_edit") >= 0)
        )

    # sub-stages of the production near-dup chain (bench.py's heavy tail)
    steps = {
        # --- stage isolation at production banding (k=24, band_rows=8)
        "sub_doc_tokens": lambda: doc_tokens(docs).select("doc_id", "w"),
        "sub_minhash_k24": lambda: minhash_signatures(docs, k=24),
        "sub_banded_k24": lambda: banded_signatures(docs, k=24, band_rows=8),
        "sub_cand_k24b8": lambda: lsh_candidate_pairs(docs, k=24, band_rows=8),
        "jaccard_on_lsh_prod": lambda: jaccard_on_lsh(
            docs, k=24, band_rows=8, threshold_milli=900
        ),
        "edit_distance_rescore_prod": rescored_df,
        "neardup_components_prod": lambda: connected_components(
            rescored_df(), src="da", dst="db"
        ),
    }

    # contract queries worth watching (same callables the frozen bench times)
    for name in [
        "minhash_signatures",
        "minhash_jaccard_est",
        "dedup_delta",
        "semdedup",
        "simhash_fingerprints",
        "simhash_candidates",
        "neardup_survivors",
        "dup_passage_scrub",
        "ann_ivf_assign",
        "ann_recall_at_k",
        "kmeans_refine",
        "contamination_check",
        "line_dedup",
        "pii_scrub",
        "tfidf_topk",
        "classifier_scores",
        "hybrid_rrf",
        "video_frame_features",
        "tpch_q5_region",
        "ann_srp_buckets",
        "dup_ngram_share",
        "quality_funnel",
        "pq_encode",
        "quality_scores",
        "winnow_fingerprints",
    ]:
        steps[name] = (lambda n: lambda: QUERIES[n](spark, SF_DIR))(name)
    return steps


def main() -> None:
    spark = build_session(
        "cdc_bench_extra", extra={"spark.sql.files.maxPartitionBytes": "33554432"}
    )
    steps = _steps(spark)
    wanted = sys.argv[1:] or list(steps)
    out = {}
    for name in wanted:
        fn = steps[name]
        spark.sparkContext.setJobDescription(name)
        times = []
        for r in range(REPEATS):
            t0 = time.monotonic()
            _noop(fn())
            times.append(round(time.monotonic() - t0, 3))
        out[name] = min(times)
        print(f"  {name}: {times} -> {min(times)}", file=sys.stderr)
        if PLANS_DIR and not name.startswith("neardup_components"):
            os.makedirs(PLANS_DIR, exist_ok=True)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = fn()._jdf.queryExecution().explainString(mode)
            with open(os.path.join(PLANS_DIR, f"{name}_{PLANS_TAG}.txt"), "w") as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "steps": out}))
    spark.stop()


if __name__ == "__main__":
    main()
