#!/usr/bin/env python
"""Per-round benchmark (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline workload is the engine itself: a seed-deterministic CDC WAL
(derived from this sf's documents) replayed tail->commit through LWW dedup
and bucketed MERGE; plus the heaviest contract queries. The two-cluster-size
scaling evidence lives in bench/run.py -> BENCH/BASELINE.md.

Each measured step runs $SPARK_GRAFT_BENCH_TRIALS times (default 2):
per-step minima are reported in "queries" (stall-robust — this sandbox
VM's hypervisor stalls whole cores for tens of seconds at a time, see
BENCH/ANALYSIS_r3.md), while the headline "value" is the MINIMUM OVER
TRIAL TOTALS — a wall time one actual run achieved, never a composite of
per-step bests no single run produced ("trial_totals" lists every trial;
"best_steps_total" is the composite, labeled as such).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_engine.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "200000"))
EVENTS_PER_EPOCH = int(os.environ.get("SPARK_GRAFT_BENCH_EPOCH", "50000"))
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))


def _sf_tag(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _gen_wal(tmp: str) -> str:
    from gen.walgen import WalConfig, generate_wal

    wal = os.path.join(tmp, "wal")
    generate_wal(
        wal,
        WalConfig(
            n_events=N_EVENTS,
            events_per_epoch=EVENTS_PER_EPOCH,
            schema_change_at_epoch=max(1, N_EVENTS // EVENTS_PER_EPOCH // 2),
            docs_parquet=os.path.join(SF_DIR, "documents.parquet"),
        ),
    )
    return wal


def _run_trial(spark, tmp: str, wal: str, trial: int) -> dict[str, float]:
    """One full pass over every measured step; fresh lake dirs per trial."""
    from pyspark.sql import functions as F

    from cdc_engine import CdcConfig, SnapLake, replay
    from cdc_engine.contract import QUERIES
    from cdc_engine.dedup_text import (
        connected_components,
        jaccard_on_lsh,
        lsh_candidate_pairs,
    )
    from cdc_engine.schemas import PAGES_SCHEMA_V1

    t: dict[str, float] = {}
    cfg = CdcConfig(events_per_epoch=EVENTS_PER_EPOCH, n_buckets=32)

    t0 = time.monotonic()
    lake = SnapLake.create(os.path.join(tmp, f"lake_t{trial}"), PAGES_SCHEMA_V1, n_buckets=32)
    replay(spark, lake, wal, cfg)
    t["cdc_ingest"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    mor = SnapLake.create(
        os.path.join(tmp, f"lake_mor_t{trial}"), PAGES_SCHEMA_V1, n_buckets=32, mode="mor"
    )
    replay(spark, mor, wal, cfg)
    t["cdc_ingest_mor"] = round(time.monotonic() - t0, 3)
    assert mor.state_hash(spark) == lake.state_hash(spark), "mode changed result!"

    headline = [
        "lww_dedup_latest",
        "cdc_merge_outcomes",
        "tpch_q1_pricing",
        "tpch_q3_topk",
        "tpch_q5_region",
        "broadcast_dim_join",
        "running_window",
        "minhash_signatures",
        "simsearch_brute_topk",
        "ann_ivf_assign",
        "quality_scores",
        "simhash_fingerprints",
        "simhash_candidates",
        "ann_srp_buckets",
        "tfidf_topk",
        "kmeans_refine",
        "scd2_history",
        "contamination_check",
        "seq_packing",
        "mixture_weights",
        "stratified_topn",
        "line_dedup",
        "dup_passage_scrub",
        "pii_scrub",
        "url_canonicalize",
        "bm25_topk",
        "semdedup",
        "unigram_logprob",
        "quality_funnel",
        "hybrid_rrf",
        "pq_encode",
        "pq_adc_topk",
        "dup_ngram_share",
        "corpus_shuffle",
        "cms_heavy_hitters",
        "bpe_encode",
        "dedup_delta",
        "classifier_scores",
        "bigram_lm_stats",
        "neardup_survivors",
        # round-6 additions: signature-agreement rescore, ANN eval, real
        # AVI demux round-trip (bpe_train stays out — the 8-round loop is
        # an offline tokenizer-training job, not a per-corpus query)
        "minhash_jaccard_est",
        "ann_recall_at_k",
        "video_frame_features",
    ]
    for name in headline:
        t0 = time.monotonic()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        t[name] = round(time.monotonic() - t0, 3)

    # Production near-dup path (round-2 verdict task 9), timed at the
    # PRODUCTION banding (k=24, band_rows=8), not the contract's (8,2):
    # the synthetic sf0.1 documents are pathologically self-similar
    # (4992 unique texts drawn from a small template pool), so (8,2)
    # makes ~85% of all 12.5M pairs candidates and exact scoring
    # degenerates to near-all-pairs (~95s) — a data property, not an
    # operator property. (24,8) still yields 2.8M candidate pairs (23%
    # of all pairs), so these rows measure candidate-bounded exact
    # scoring throughput on a worst-case-similarity corpus. The (8,2)
    # form stays hash-checked by the contract at sf0.01.
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    t0 = time.monotonic()
    jaccard_on_lsh(docs, k=24, band_rows=8, threshold_milli=900).write.format(
        "noop"
    ).mode("overwrite").save()
    t["jaccard_on_lsh"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    cand = lsh_candidate_pairs(docs, k=24, band_rows=8)
    pre = docs.select("doc_id", F.substring("text", 1, 64).alias("p"))
    a, b = pre.alias("a"), pre.alias("b")
    # thresholded levenshtein (banded DP early exit): row-identical to
    # `lev(a,b) <= 16` for kept rows; the r5 lever on this entry — the
    # cost is the candidate-explosion DP, not tokenization (ANALYSIS_r5 §1)
    rescored = (
        cand.join(a, F.col("da") == F.col("a.doc_id"))
        .join(b, F.col("db") == F.col("b.doc_id"))
        .select("da", "db", F.levenshtein(F.col("a.p"), F.col("b.p"), 16).alias("prefix_edit"))
        .where(F.col("prefix_edit") >= 0)
    )
    rescored.write.format("noop").mode("overwrite").save()
    t["edit_distance_rescore"] = round(time.monotonic() - t0, 3)

    # cluster the rescored pairs: the last stage of the production
    # near-dup path (pairs -> components -> survivorship)
    t0 = time.monotonic()
    connected_components(rescored, src="da", dst="db").write.format("noop").mode(
        "overwrite"
    ).save()
    t["neardup_components"] = round(time.monotonic() - t0, 3)
    return t


def main() -> None:
    from cdc_engine import CdcConfig, SnapLake, replay
    from cdc_engine.schemas import PAGES_SCHEMA_V1

    tmp = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        wal = _gen_wal(tmp)  # generation excluded from timing
        spark = build_session(
            "cdc_bench", extra={"spark.sql.files.maxPartitionBytes": "33554432"}
        )

        # JVM/codegen/shuffle warm-up on a throwaway lake (first-run effects
        # are ~3x and not what we're measuring)
        warm = SnapLake.create(os.path.join(tmp, "lake_warm"), PAGES_SCHEMA_V1, n_buckets=32)
        replay(spark, warm, wal, CdcConfig(events_per_epoch=EVENTS_PER_EPOCH, n_buckets=32), max_epochs=1)

        trials: list[dict[str, float]] = []
        for trial in range(TRIALS):
            trials.append(_run_trial(spark, tmp, wal, trial))
        # per-step minima (stall-robust per-step estimator) ...
        timings = {k: min(tr[k] for tr in trials) for k in trials[0]}
        # ... but the HEADLINE total is min-of-trial-totals: a wall time one
        # actual run achieved, never a composite no single run produced
        # (round-3 advisor finding on bench.py)
        trial_totals = [round(sum(tr.values()), 3) for tr in trials]
        total = min(trial_totals)
        print(
            json.dumps(
                {
                    "metric": "cdc_ingest_plus_headline_queries_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "trial_totals": trial_totals,
                    "best_steps_total": round(sum(timings.values()), 3),
                    "sf": _sf_tag(SF_DIR),
                    "events": N_EVENTS,
                    "trials": TRIALS,
                    "events_per_sec_cow": round(N_EVENTS / timings["cdc_ingest"], 1),
                    "events_per_sec_mor": round(N_EVENTS / timings["cdc_ingest_mor"], 1),
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
