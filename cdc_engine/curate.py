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
    band_rows: int = 4,
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
        n_curated = curated.count()  # finalize job: funnel + join + split + both obs
        if n_curated == 0:
            # obs_fun rides the join's BUILD side (fun -> keep): under AQE
            # an Observation on the build side can surface no metrics when
            # the join output is empty — reachable when the funnel rejects
            # EVERY doc (strict --min-words/--max-words on a small corpus;
            # round-7 advice). Fall back to a direct narrow aggregate over
            # the funnel relation on that rare path (join count == funnel
            # pass count, so empty output <=> zero passes).
            row = fun.agg(
                *[
                    F.sum(F.when(F.col("first_fail") == s, 1).otherwise(0)).alias(s)
                    for s in fun_stages
                ],
                F.sum(F.when(F.col("passed") == 1, F.col("n_words"))).alias("_nw"),
            ).collect()[0]
            funnel_counts = row.asDict()
        else:
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


# ---------------------------------------------------------------------------
# Incremental curation: curate a CDC epoch AGAINST the standing corpus
# without recomputing it (r5 verdict next-task 7 — the production shape:
# new docs screened vs maintained state, state appended).
# ---------------------------------------------------------------------------

_STATE_PARAMS = ("neardup", "k", "band_rows", "threshold_milli",
                 "min_words", "max_words", "val_permille", "test_permille")


def _state_meta_path(state_dir: str) -> str:
    import os

    return os.path.join(state_dir, "_META.json")


def _read_state_meta(state_dir: str) -> dict | None:
    import json
    import os

    p = _state_meta_path(state_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def curate_incremental(
    spark,
    epoch_docs: DataFrame,
    state_dir: str,
    *,
    neardup: bool = True,
    k: int = 8,
    band_rows: int = 4,
    threshold_milli: int = 600,
    min_words: int = 25,
    max_words: int = 90,
    val_permille: int = 100,
    test_permille: int = 100,
) -> tuple[DataFrame, DataFrame, dict]:
    """Curate ONE epoch of new docs against the standing curation state,
    appending the state — per-epoch cost ∝ epoch size × index-bucket
    occupancy, never ∝ corpus.

    The FIRST call on an empty ``state_dir`` is the bootstrap: an empty
    state makes every stage degenerate to the full pipeline (exact dedup
    sees no prior hashes, delta candidates have no index side), so one
    code path serves both and bootstrap-vs-curate() equivalence is a
    test, not a claim.

    Returns ``(curated_epoch, retractions, report)``:

    * ``curated_epoch`` — the epoch's survivors with scrubbed text +
      split column (same shape as ``curate()``'s output);
    * ``retractions`` — (retracted_id, superseded_by): PRIOR survivors
      that a new doc BRIDGED into a component with a smaller canonical
      id. Full-corpus equivalence (pinned by
      tests/test_curate_incremental.py) is
      ``curate(old ∪ epoch) == (prior survivors − retractions) ∪ epoch
      survivors`` — without retractions an incremental pipeline silently
      diverges from the batch recompute whenever an epoch doc links two
      standing near-dup clusters;
    * ``report`` — epoch funnel counts + retraction count.

    State layout (committed-epochs pattern, crash-safe: _META.json lists
    committed epochs and the current labels version; an interrupted run
    leaves an uncommitted subdir that readers never touch):

      state_dir/seen/e{n}/    (hash, canonical_id)  — append per epoch
      state_dir/corpus/e{n}/  (doc_id, text, lang)  — append per epoch
      state_dir/index/e{n}/   (doc_id, band, band_key) — append per epoch
      state_dir/labels/v{n}/  (node, component)     — rewritten per epoch
      state_dir/_META.json

    At 100 TB each of these is a SnapLake table (seen/index/corpus append
    epochs exactly like the WAL lake; labels is a compact merge target);
    the parquet-dir form keeps this module lake-agnostic.

    CONTRACT: epoch doc_ids must be strictly greater than every prior
    doc_id (the CDC monotone-key assumption, same as WAL seq) — enforced,
    because component canonical-min semantics depend on it.

    Scale shape per epoch: scrub/funnel/split are per-doc; exact dedup is
    one epoch-sized shuffle + an anti-join against the hash table (keyed,
    broadcastable at epoch scale); near-dup candidates are
    delta_lsh_candidates (epoch × index + epoch self-join — old × old
    never revisited); the rescore joins ONLY candidate-touched corpus
    rows; components run on the CONTRACTED graph (old components are
    supernodes named by their canonical min), so the loop's input is
    ∝ epoch edges + touched components, not corpus edges.
    """
    import json
    import os

    from pyspark.sql import Observation

    from cdc_engine.dedup_text import (
        banded_signatures,
        connected_components,
        delta_lsh_candidates,
        exact_dedup_canonical,
        jaccard_rescore,
    )
    from cdc_engine.sampling import split_column
    from cdc_engine.textops import pii_scrub, quality_funnel

    params = {
        "neardup": neardup, "k": k, "band_rows": band_rows,
        "threshold_milli": threshold_milli, "min_words": min_words,
        "max_words": max_words, "val_permille": val_permille,
        "test_permille": test_permille,
    }
    meta = _read_state_meta(state_dir)
    if meta is None:
        meta = {"params": params, "epochs": [], "max_doc_id": None,
                "labels_version": None}
        os.makedirs(state_dir, exist_ok=True)
    elif meta["params"] != params:
        raise ValueError(
            f"curate state at {state_dir} was built with params "
            f"{meta['params']}; this call passed {params} — near-dup "
            f"signatures and thresholds are not comparable across params"
        )
    n_epoch = (meta["epochs"][-1] + 1) if meta["epochs"] else 0

    report: dict = {}
    persisted: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        persisted.append(df.persist())
        return df

    def _read(table: str) -> DataFrame | None:
        paths = [
            os.path.join(state_dir, table, f"e{n}") for n in meta["epochs"]
        ]
        return spark.read.parquet(*paths) if paths else None

    try:
        # -- 0. monotone-id contract
        if meta["max_doc_id"] is not None:
            lo = epoch_docs.agg(F.min("doc_id").alias("lo")).first()["lo"]
            if lo is None:
                raise ValueError("empty epoch")
            if int(lo) <= int(meta["max_doc_id"]):
                raise ValueError(
                    f"epoch doc_ids must exceed the state's max_doc_id "
                    f"({meta['max_doc_id']}); got min {lo} — incremental "
                    f"canonical-min semantics require monotone ids"
                )

        # -- 1. PII scrub (identical to curate() stage 1)
        scrubbed = pii_scrub(epoch_docs, col="text")
        base_cols = [c for c in epoch_docs.columns if c != "text"]
        obs_pii = Observation(f"inc_pii_e{n_epoch}")
        e1 = _persist(
            scrubbed.observe(
                obs_pii,
                F.sum("n_emails").alias("e"),
                F.sum("n_ips").alias("i"),
                F.sum("n_phones").alias("p"),
            ).select(*base_cols, F.col("clean_text").alias("text"))
        )
        report["docs_in"] = e1.count()
        if report["docs_in"] == 0:
            # uniform with the non-bootstrap monotone-id guard: an empty
            # epoch must fail loudly BEFORE any state commit — on a fresh
            # state it previously slipped through to _commit_state and
            # died opaquely on int(None) from max(doc_id) (round-7 advice)
            raise ValueError("empty epoch")
        pii = obs_pii.get
        report["pii_redactions"] = {
            "emails": int(pii["e"] or 0),
            "ips": int(pii["i"] or 0),
            "phones": int(pii["p"] or 0),
        }

        # -- 2. exact dedup: within-epoch canonical, then anti-join the
        # standing hash table (a new doc identical to ANY prior doc is a
        # dup — prior docs have smaller ids by the monotone contract)
        canon = exact_dedup_canonical(e1)
        e2 = e1.join(
            canon.where(F.col("is_dup")).select(F.col("doc_id").alias("_d")),
            e1["doc_id"] == F.col("_d"),
            "left_anti",
        )
        seen = _read("seen")
        if seen is not None:
            e2 = e2.join(
                seen.select(F.col("hash").alias("_h")),
                F.md5(e2["text"]) == F.col("_h"),
                "left_anti",
            )
        e2 = _persist(e2)
        report["after_exact_dedup"] = e2.count()

        # -- 3. near dedup on the contracted graph
        labels = _labels_read(spark, state_dir, meta)
        retractions = None
        if neardup:
            bn = _persist(banded_signatures(e2, k, band_rows))
            old_index = _read("index")
            if old_index is not None:
                cand = delta_lsh_candidates(
                    None, e2, k, band_rows, old_banded=old_index
                )
            else:
                # bootstrap: no index yet — the epoch IS the corpus
                from cdc_engine.dedup_text import lsh_candidate_pairs

                cand = lsh_candidate_pairs(e2, k, band_rows)
            # rescore universe: the epoch plus ONLY candidate-touched
            # corpus rows (the joins inside jaccard_rescore prune)
            corpus = _read("corpus")
            universe = (
                e2.select("doc_id", "text", "lang").unionByName(corpus)
                if corpus is not None
                else e2.select("doc_id", "text", "lang")
            )
            pairs = jaccard_rescore(cand, universe, threshold_milli)
            mx = meta["max_doc_id"]
            is_old = (lambda c: F.col(c) <= F.lit(mx)) if mx is not None else (
                lambda c: F.lit(False)
            )
            # contract old endpoints to their component label (supernode)
            if labels is not None:
                la = labels.select(
                    F.col("node").alias("_na"), F.col("component").alias("_ca")
                )
                lb = labels.select(
                    F.col("node").alias("_nb"), F.col("component").alias("_cb")
                )
                e_contract = (
                    pairs.join(la, pairs["da"] == F.col("_na"), "left")
                    .join(lb, pairs["db"] == F.col("_nb"), "left")
                    .select(
                        F.coalesce(F.col("_ca"), F.col("da")).alias("u"),
                        F.coalesce(F.col("_cb"), F.col("db")).alias("v"),
                    )
                )
            else:
                e_contract = pairs.select(
                    F.col("da").alias("u"), F.col("db").alias("v")
                )
            merged = _persist(
                connected_components(e_contract, src="u", dst="v")
            )
            merged.count()
            # epoch survivors: a new doc is dropped iff its merged
            # component's canonical min is a smaller id (old label or
            # smaller new doc). Isolated epoch docs never enter `merged`
            # and survive by absence from the drop set.
            dropped_new = merged.where(
                (~is_old("node")) & (F.col("node") != F.col("component"))
            ).select(F.col("node").alias("_drop"))
            e3 = _persist(
                e2.join(dropped_new, e2["doc_id"] == F.col("_drop"), "left_anti")
            )
            report["after_near_dedup"] = e3.count()
            # retractions: an old canonical label bridged into a component
            # with a smaller min is no longer canonical
            retractions = merged.where(
                is_old("node") & (F.col("component") < F.col("node"))
            ).select(
                F.col("node").alias("retracted_id"),
                F.col("component").alias("superseded_by"),
            )
            retractions = retractions.persist()
            report["retractions"] = retractions.count()
        else:
            bn = None
            e3 = e2
            report["after_near_dedup"] = report["after_exact_dedup"]
            report["retractions"] = 0

        # -- 4+5. quality funnel + splits (identical to curate()).
        # EMPTY-EPOCH GUARD: an epoch can dedup to zero survivors (every
        # doc matched the standing corpus — routine under CDC). Catalyst's
        # PropagateEmptyRelation then folds the funnel subtree to an empty
        # LocalRelation and PRUNES the CollectMetrics node, so
        # Observation.get returns a schema-less row and pyspark's toPyRow
        # asserts. Zero rows need no jobs anyway — report zeros directly.
        fun_stages = ("r1_len", "r2_wordlen", "r3_stop", "r4_punct", "r5_ttr", "pass")
        if report["after_near_dedup"] == 0:
            curated = e3.withColumn("split", F.lit("train")).limit(0).persist()
            report["funnel"] = {s: 0 for s in fun_stages}
            report["after_quality"] = 0
            report["n_words_curated"] = 0
            if retractions is None:
                retractions = spark.createDataFrame(
                    [], "retracted_id long, superseded_by long"
                )
            _commit_state(
                spark, state_dir, meta, n_epoch, e1, e2,
                bn if neardup else None, labels, merged if neardup else None,
                is_old if neardup else None,
            )
            return curated, retractions, report
        # funnel report via a direct aggregate over the persisted funnel
        # relation, NOT an Observation: under AQE, an Observation riding
        # the join's build side surfaces no metrics when the join output
        # is empty (quality can legitimately reject a whole small epoch),
        # and Observation.get then dies in toPyRow. curate() keeps the
        # Observation form — its batch corpus is never empty — this path
        # pays one extra narrow agg job over the CACHED epoch instead.
        fun = _persist(
            quality_funnel(e3, min_words=min_words, max_words=max_words)
        )
        frow = fun.agg(
            *[
                F.sum(F.when(F.col("first_fail") == s, 1).otherwise(0)).alias(s)
                for s in fun_stages
            ],
            F.sum(F.when(F.col("passed") == 1, F.col("n_words"))).alias("_nw"),
        ).first()
        keep = fun.where(F.col("passed") == 1).select("doc_id")
        curated = (
            e3.join(keep, "doc_id")
            .withColumn(
                "split",
                split_column(
                    F.col("doc_id"),
                    val_permille=val_permille,
                    test_permille=test_permille,
                ),
            )
        )
        curated = curated.persist()
        curated.count()
        report["funnel"] = {s: int(frow[s] or 0) for s in fun_stages}
        report["after_quality"] = report["funnel"]["pass"]
        report["n_words_curated"] = int(frow["_nw"] or 0)

        # -- 6. state writes
        _commit_state(
            spark, state_dir, meta, n_epoch, e1, e2,
            bn if neardup else None, labels, merged if neardup else None,
            is_old if neardup else None,
        )

        if retractions is None:
            retractions = spark.createDataFrame(
                [], "retracted_id long, superseded_by long"
            )
    finally:
        for df in persisted:
            df.unpersist()
    return curated, retractions, report


def _commit_state(spark, state_dir, meta, n_epoch, e1, e2, bn, labels, merged, is_old):
    """State writes: epoch subdirs first, _META.json LAST — the commit
    point; an interrupted run leaves orphan subdirs readers never list.
    Subdir writes use mode('overwrite'), NOT errorifexists (round-7
    advice): uncommitted e{n}/v{n} dirs are invisible to readers (only
    _META.json's epoch list is read), but a crash between the first
    subdir write and the meta rename used to leave orphans that made any
    RETRY of the same epoch fail with 'path already exists' — wedging
    the state dir permanently. Overwriting crash debris is safe exactly
    because it was never committed."""
    import json
    import os

    e2.select(
        F.md5("text").alias("hash"), F.col("doc_id").alias("canonical_id")
    ).write.mode("overwrite").parquet(
        os.path.join(state_dir, "seen", f"e{n_epoch}")
    )
    e2.select("doc_id", "text", "lang").write.mode("overwrite").parquet(
        os.path.join(state_dir, "corpus", f"e{n_epoch}")
    )
    if bn is not None:
        bn.write.mode("overwrite").parquet(
            os.path.join(state_dir, "index", f"e{n_epoch}")
        )
        # labels rewrite: relabel bridged old components, append the
        # epoch's nodes (isolated epoch docs label themselves)
        v_next = (meta["labels_version"] or 0) + 1
        relabel = merged.where(is_old("node")).select(
            F.col("node").alias("_old"), F.col("component").alias("_new")
        )
        if labels is not None:
            labels_next = (
                labels.join(
                    relabel, labels["component"] == F.col("_old"), "left"
                )
                .select(
                    "node",
                    F.coalesce(F.col("_new"), F.col("component")).alias("component"),
                )
            )
        else:
            labels_next = None
        new_nodes = merged.where(~is_old("node")).select("node", "component")
        iso = e2.select(F.col("doc_id").alias("node")).join(
            merged.select("node"), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
        epoch_labels = new_nodes.unionByName(iso)
        labels_next = (
            labels_next.unionByName(epoch_labels)
            if labels_next is not None
            else epoch_labels
        )
        labels_next.write.mode("overwrite").parquet(
            os.path.join(state_dir, "labels", f"v{v_next}")
        )
        meta["labels_version"] = v_next
    mx_new = e1.agg(F.max("doc_id").alias("m")).first()["m"]
    meta["max_doc_id"] = int(mx_new) if meta["max_doc_id"] is None else max(
        int(meta["max_doc_id"]), int(mx_new)
    )
    meta["epochs"].append(n_epoch)
    tmp = _state_meta_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _state_meta_path(state_dir))


def _labels_read(spark, state_dir: str, meta: dict) -> DataFrame | None:
    import os

    v = meta.get("labels_version")
    if not v:
        return None
    return spark.read.parquet(os.path.join(state_dir, "labels", f"v{v}"))
