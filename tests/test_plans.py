"""Physical-plan assertions: the properties the 100 TB story depends on
must be visible in the optimized plan, not just claimed in docstrings —
column pruning reaches the parquet scan, filters push down, small dims
broadcast, ANN argmax is an aggregate (no per-key sort), and the text/
dedup operators stay JVM-side (no Python eval nodes)."""

from __future__ import annotations

import contextlib
import io
import os

from cdc_engine.contract import QUERIES

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    """token_counts touches only (doc_id, text): the scan's ReadSchema must
    exclude the other document columns."""
    p = _plan(QUERIES["token_counts"](spark, SF))
    read = [l for l in p.splitlines() if "ReadSchema" in l]
    assert read, p
    assert "doc_id" in read[0] and "text" in read[0]
    assert "source" not in read[0] and "n_chars" not in read[0]


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(QUERIES["tpch_q1_pricing"](spark, SF))
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed and "l_shipdate" in pushed[0], p


def test_seq_range_pushdown(spark, wal_basic):
    from cdc_engine.source import read_seq_range

    wal_dir, _, _ = wal_basic
    p = _plan(read_seq_range(spark, wal_dir, 2000, 4000))
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed and "seq" in pushed[0], p


def test_small_dims_broadcast_in_q5(spark):
    p = _plan(QUERIES["tpch_q5_region"](spark, SF), mode="simple")
    assert "BroadcastHashJoin" in p, p


def test_ivf_assign_is_aggregate_not_window(spark):
    """The per-vector argmax must be a hash aggregate (map-side combine),
    never a Window sort over the 16x-expanded candidate relation."""
    p = _plan(QUERIES["ann_ivf_assign"](spark, SF), mode="simple")
    assert "Window" not in p, p
    assert "max_by" in p or "HashAggregate" in p, p


def test_text_ops_have_no_python_nodes(spark):
    """Everything claimed pure-Catalyst must show no Python eval in the
    plan (BatchEvalPython = per-row; ArrowEvalPython = vectorized — the
    text/dedup hot paths need neither)."""
    for name in (
        "token_counts",
        "quality_scores",
        "lang_id",
        "doc_fingerprints",
        "simhash_fingerprints",
        "minhash_signatures",
        "lsh_candidates",
        "dedup_canonical_map",
        "tfidf_topk",
        "bm25_topk",
        "kmeans_refine",
        "line_dedup",
        "pii_scrub",
        "url_canonicalize",
        "dup_passage_scrub",
        "semdedup",
        "unigram_logprob",
        "quality_funnel",
        "hybrid_rrf",
        "pq_encode",
        "pq_adc_topk",
        "dup_ngram_share",
        "corpus_shuffle",
        "cms_heavy_hitters",
        "classifier_scores",
        "bigram_lm_stats",
    ):
        p = _plan(QUERIES[name](spark, SF), mode="simple")
        assert "EvalPython" not in p, f"{name} runs Python:\n{p}"


def test_line_dedup_df_agg_exchanges_hashes_not_lines(spark):
    """The cross-doc document-frequency aggregate must key on md5(line):
    the shuffled relation carries the 32-char hash, never the line text
    (at 100 TB the df exchange would otherwise move the whole corpus)."""
    p = _plan(QUERIES["line_dedup"](spark, SF))
    agg = [l for l in p.splitlines() if "Keys" in l and "lh" in l]
    assert agg, p


def test_neardup_blocking_is_equi_join(spark):
    """The SRP-blocked near-dup and the banded-SimHash candidate join must
    candidate-generate via an EQUI join on the probe/bucket/band key — a
    cartesian/broadcast-nested-loop node would mean the blocking silently
    degenerated to all-pairs."""
    for name in ("embedding_neardup_pairs", "simhash_candidates", "dedup_delta"):
        p = _plan(QUERIES[name](spark, SF), mode="simple")
        assert "CartesianProduct" not in p, (name, p)
        assert "BroadcastNestedLoopJoin" not in p, (name, p)


def test_classifier_weights_broadcast(spark):
    """The hashed weight table is the model — it must reach the token
    relation as a BroadcastHashJoin (a shuffled join on the feature id
    would move the corpus-sized token relation for a 256-row dim)."""
    p = _plan(QUERIES["classifier_scores"](spark, SF), mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_jaccard_chain_reuses_tokenization(spark):
    """jaccard_on_lsh must share ONE distinct token relation across the
    signature, size, and intersection stages (round-3 verdict #3: it
    tokenized the corpus three times). With AQE off, the static planner
    must mark the shared token shuffle as ReusedExchange; with AQE on the
    same reuse happens at runtime via stage reuse."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = _plan(QUERIES["jaccard_on_lsh"](spark, SF))
        assert "ReusedExchange" in p, p
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_edit_rescore_shares_exchange_and_bounds_levenshtein(spark):
    """edit_distance_rescore (round-4 verdict #2): the signature stage
    takes the shared distinct token relation, the banded self-join reuses
    one exchange, and the candidate explosion is scored with the
    THRESHOLDED levenshtein (banded DP early exit) — the measured 1.8x
    lever on this entry — never a cartesian or a Python eval node."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = _plan(QUERIES["edit_distance_rescore"](spark, SF), mode="simple")
        assert "ReusedExchange" in p, p
        assert "CartesianProduct" not in p, p
        assert "EvalPython" not in p, p
        assert "levenshtein" in p and "Some(16)" in p, p
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def _top_physical_node(p: str) -> str:
    for line in p.splitlines():
        s = line.strip()
        if not s or s.startswith("==") or "AdaptiveSparkPlan" in s:
            continue
        return s
    return ""


def test_no_presentation_sort_in_hot_queries(spark):
    """The driver's value-hash is order-insensitive, so contract queries
    must not end in a global presentation sort (round-3 verdict #4 — a
    full extra exchange+sort per query at any scale). Semantic sorts
    (top-k orderBy+limit -> TakeOrderedAndProject, window-internal sorts)
    are still allowed below the root."""
    for name in (
        "jaccard_on_lsh",
        "edit_distance_rescore",
        "minhash_signatures",
        "lsh_candidates",
        "simhash_fingerprints",
        "dedup_canonical_map",
        "boilerplate_share",
        "repetition_stats",
        "denylist_scrub",
        "epoch_stats",
        "running_window",
        "embedding_neardup_pairs",
    ):
        top = _top_physical_node(_plan(QUERIES[name](spark, SF), mode="simple"))
        assert "Sort" not in top, f"{name} roots at a presentation sort: {top}"


def test_minhash_single_shuffle_before_order(spark):
    """The signature aggregation must shuffle the token relation exactly
    once (one hashpartitioning exchange on doc_id); the 8x crossJoin form
    shuffled k copies. The only other exchange allowed is the VOCAB
    distinct feeding the broadcast hash-precompute (round 7): it carries
    one row per distinct token after map-side partial aggregation — never
    the instance-sized token relation — and the per-token md5s must ride
    a BroadcastHashJoin back onto the instances, not a shuffled join."""
    p = _plan(QUERIES["minhash_signatures"](spark, SF), mode="simple")
    assert p.count("Exchange hashpartitioning(doc_id") == 1, p
    assert p.count("Exchange hashpartitioning") == 2, p  # + the vocab distinct
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p


def test_contamination_bench_side_broadcasts(spark):
    """The benchmark shingle set must broadcast: the training side (the
    100 TB side) joins it with a BroadcastHashJoin, never a sort-merge —
    and the whole chain stays JVM-side."""
    p = _plan(QUERIES["contamination_check"](spark, SF), mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "PythonUDF" not in p and "BatchEvalPython" not in p, p


def test_seq_packing_global_window_only_on_tiny_relation(spark):
    """pack_sequences' only single-partition exchange must feed the tiny
    per-range offsets relation (downstream of the range hash aggregate),
    never the full doc relation: exactly one SinglePartition exchange,
    and at least one hash aggregate upstream of it in the tree."""
    df = QUERIES["seq_packing"](spark, SF)
    p = _plan(df, mode="simple")
    assert p.count("Exchange SinglePartition") == 1, p
    # the big-side cumsum stays partitioned by the range bucket
    assert "hashpartitioning(rb" in p, p
    assert "PythonUDF" not in p, p


def test_round6_queries_plan_shapes(spark):
    """Round-6 additions: minhash_jaccard_est is pure Catalyst (the O(k)
    signature-agreement rescore must not leave the JVM) with equi-join
    candidate generation; ann_recall_at_k's only non-equi node is the
    broadcast of the 20-query panel (never a CartesianProduct);
    video_frame_features' demux is Arrow-batched MapInPandas, never
    row-at-a-time Python."""
    p = _plan(QUERIES["minhash_jaccard_est"](spark, SF), mode="simple")
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p

    p = _plan(QUERIES["ann_recall_at_k"](spark, SF), mode="simple")
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p  # panel rides a broadcast NLJ

    p = _plan(QUERIES["video_frame_features"](spark, SF), mode="simple")
    assert "MapInPandas" in p, p  # Arrow-batched demux
    assert "BatchEvalPython" not in p, p  # never per-row Python
