"""Document deduplication operators (training-data pipeline):

  * exact dedup        — md5 content hash, hash-groupBy (one shuffle)
  * n-gram Jaccard     — token-set overlap via explode + self-join on token,
                         blocked by lang to bound the candidate space
  * MinHash + LSH      — k md5-derived minhashes, banded into LSH buckets,
                         bucket-join for candidate pairs
  * SimHash            — 48-bit similarity hash, pure Catalyst (48 sign-sum
                         aggregates over md5-derived token-hash bits)

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

from pyspark.sql import DataFrame, functions as F

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


def exact_dedup_canonical(docs: DataFrame) -> DataFrame:
    """Survivorship map for exact dedup: every doc -> the canonical (lowest
    doc_id) member of its identical-content group. (doc_id, canonical_id,
    is_dup). One window min over the md5 hash — a single shuffle on the
    content hash, the 100 TB exact-dedup shape."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text"))
    return docs.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    ).orderBy("doc_id")


def doc_tokens(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, lang, token) — the shared shingle relation."""
    return (
        docs.select("doc_id", "lang", F.explode(tokens_expr()).alias("w"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold_milli: int = 300) -> DataFrame:
    """Near-duplicate pairs by token-set Jaccard >= threshold (milli-units),
    blocked by lang. Returns (da, db, inter, na, nb, jacc_milli).

    Exhaustive-within-block form: the token self-join is quadratic in
    posting-list length inside a block, so this is for SMALL blocks /
    audits. The web-scale path is jaccard_on_lsh below (identical scoring,
    LSH-bucket blocking)."""
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
    md5_48(concat(i, ':', token)). Returns (doc_id, i, minhash).

    Scale shape: ONE groupBy(doc_id) computing all k minima as separate
    aggregate columns (map-side combine, 1x the token relation through the
    shuffle), then an in-row explode to the (doc_id, i, minhash) layout.
    The naive form — crossJoin(range(k)) then groupBy(doc_id, i) — pushes
    k-times the token relation through the shuffle for identical output."""
    # NO distinct: min() over the token multiset equals min() over the set,
    # so the dedup shuffle doc_tokens pays is pure waste here — explode
    # feeds the hash aggregate directly and map-side combine collapses each
    # doc to one k-column row before the only shuffle
    tok = docs.select("doc_id", F.explode(tokens_expr()).alias("w"))
    mins = [
        F.min(_md5_48(F.concat(F.lit(f"{i}:"), F.col("w")))).alias(f"_m{i}")
        for i in range(k)
    ]
    agg = tok.groupBy("doc_id").agg(*mins)
    pairs = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("i"), F.col(f"_m{i}").alias("minhash")
        )
        for i in range(k)
    ])
    return (
        agg.select("doc_id", F.explode(pairs).alias("_p"))
        .select("doc_id", "_p.i", "_p.minhash")
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


def jaccard_on_lsh(
    docs: DataFrame, k: int = 8, band_rows: int = 2, threshold_milli: int = 300
) -> DataFrame:
    """Exact token-set Jaccard computed ONLY over MinHash-LSH candidate
    pairs — the web-scale form of ngram_jaccard_pairs: the all-pairs token
    self-join (quadratic in posting-list length inside a block) is replaced
    by LSH-bucket blocking, so total work is bounded by candidate count x
    document length rather than block-size^2. Recall is the LSH band
    recall (pairs sharing no band are never scored — by design).
    Returns (da, db, inter, na, nb, jacc_milli) above the threshold."""
    cand = lsh_candidate_pairs(docs, k, band_rows)
    tok = doc_tokens(docs).select("doc_id", "w")
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(tok.alias("a"), F.col("da") == F.col("a.doc_id"))
        .join(
            tok.alias("b"),
            (F.col("db") == F.col("b.doc_id")) & (F.col("a.w") == F.col("b.w")),
        )
        .groupBy("da", "db")
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


SIMHASH_BITS = 48


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """48-bit SimHash per doc, pure Catalyst (no Python in the hot path):
    explode distinct tokens, take the 48-bit md5 token hash, and for each
    bit position aggregate a +1/-1 sign sum per doc; bit i of the
    fingerprint is set iff sum_i > 0. One hash-aggregate shuffle with
    map-side combine over 48 long counters — and, being expression-only,
    the DuckDB oracle reproduces it bit-for-bit (the previous pandas-UDF
    form was a per-row Python loop AND un-oracle-able).

    Docs whose text is NULL get NULL; docs with no tokens get 0 (the empty
    sign vector), matching the reference pandas implementation in tests."""
    tok = doc_tokens(docs).select("doc_id", "w").withColumn("_h", _md5_48(F.col("w")))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    fp = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"_s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    sim = agg.select("doc_id", fp.alias("_fp"))
    return (
        docs.select("doc_id", "text")
        .join(sim, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("text").isNull(), F.lit(None).cast("long"))
            .otherwise(F.coalesce(F.col("_fp"), F.lit(0).cast("long")))
            .alias("simhash"),
        )
        .orderBy("doc_id")
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors until a fixpoint. Returns (node, component)
    where component is the minimum node id reachable from the node.

    This is THE missing piece between near-dup pair generation (LSH ->
    rescore) and survivorship: duplicate PAIRS don't partition a corpus,
    duplicate CLUSTERS do — keep min(doc_id) per component, drop the rest.

    Scale notes: each round is one join + one min-aggregate, both shuffling
    on the node id — rounds = graph diameter. Near-dup graphs are
    overwhelmingly tiny cliques/stars (diameter 1-2), so 3-4 rounds close
    them; the adversarial long-path case is bounded by ``max_iter`` and at
    true web scale the round count is cut to O(log n) with the
    large-star/small-star transform [Kiveris et al., "Connected Components
    in MapReduce and Beyond"], which swaps this loop's propagation step for
    alternating star contractions over the same (join + min-agg) plan. The
    per-round driver work here is ONE bounded count (the convergence
    check), never a row collect.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # persist the undirected edge list: every round joins against it, and
    # without the cache each round would recompute the edges' FULL lineage
    # (for the near-dup graph that is the whole MinHash->LSH->Levenshtein
    # chain per round — measured 3-4x the loop's total cost)
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    lab = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    lab.count()  # materialize before the loop
    try:
        for _ in range(max_iter):
            msgs = und.join(lab, und["a"] == lab["node"]).select(
                F.col("b").alias("node"), "component"
            )
            new = (
                lab.union(msgs)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .persist()
            )
            changed = (
                new.alias("n")
                .join(lab.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            lab.unpersist()
            lab = new
            if changed == 0:
                # `lab` is materialized (the count above), so the cached
                # edge list is no longer needed by its lineage
                return lab.orderBy("node")
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        und.unpersist()
