"""Similarity search over embedding columns (array<float>).

Determinism across engines: dot products are computed on QUANTIZED integer
components (cast(round(x*1000) as bigint)) so sums are exact and
order-insensitive — float accumulation order would differ between Spark's
codegen and DuckDB and break value-hash comparison.

  * brute_topk     — exact top-k by quantized dot product against one query
                     vector; the correctness baseline. No explode: the dot
                     product is a zip_with/aggregate over the array columns,
                     fully JVM-side, one broadcast of the query row.
  * ivf_assign     — IVF-style cell assignment: nearest of C seeded
                     centroids (here: the first C vectors). At scale this is
                     the partitioning function: vectors are bucketed by cell
                     and a query probes only its cell(s).
  * ivf_query_topk — top-k restricted to the query's cell — the scale path
                     (scan 1/C of the data instead of all of it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdc_engine.salt import spread

# quantized integer dot product of two array<float> columns, JVM-side
_DOT_Q = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "cast(round(cast(x as double) * 1000) as bigint) * "
    "cast(round(cast(y as double) * 1000) as bigint)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)


def dot_q(a: str, b: str):
    return F.expr(_DOT_Q.format(a=a, b=b))


def brute_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    # spread (guide §2.5): the corpus side's per-row dot products must use
    # every core — a single-row-group embeddings file scans as ONE partition
    return (
        spread(emb).where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", dot_q("embedding", "qe").alias("dot_q"))
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(k)
    )


def ivf_assign(emb: DataFrame, n_cells: int = 16) -> DataFrame:
    """(vec_id, cell, cell_dot_q): nearest centroid by quantized dot.
    Centroids are the first ``n_cells`` vectors (deterministic seed set).
    Ties break to the lowest centroid id."""
    cents = emb.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("ce")
    )
    # spread (guide §2.5): C dots per vector, all serial on a 1-partition
    # scan otherwise (measured 1.67 -> 0.48 s at sf0.1 / local[32])
    scored = spread(emb).crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", dot_q("embedding", "ce").alias("cell_dot_q")
    )
    # argmax as a hash aggregate, not a window: the payload here is narrow
    # (two ints), so max_by gets map-side partial combine and skips the
    # window's per-partition sort entirely — each vec_id's C candidate rows
    # collapse before the shuffle. (Contrast dedup.lww_dedup, where the WIDE
    # payload makes the sort-based window the scaling strategy.)
    # Ordering: max (cell_dot_q, -cell) == highest dot, ties to lowest cell.
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cell", "cell_dot_q"),
                F.struct(F.col("cell_dot_q"), (-F.col("cell")).alias("_nc")),
            ).alias("_b")
        )
        .select(
            "vec_id",
            F.col("_b.cell").alias("cell"),
            F.col("_b.cell_dot_q").alias("cell_dot_q"),
        )
    )
    return best


def _srp_hyperplanes(n_bits: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes for sign-random-projection
    LSH: component (j, i) is an integer in [-500, 500] derived from
    md5(f"{j}:{i}") — reproducible in any engine, no RNG state. Milli-scale
    integers keep the projections integer-exact cross-engine."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) % 1001 - 500
            for i in range(dim)
        ]
        for j in range(n_bits)
    ]


def srp_buckets(emb: DataFrame, n_bits: int = 16, dim: int = 64) -> DataFrame:
    """(vec_id, srp_bucket): sign-random-projection LSH bucket id — bit j is
    set iff dot(embedding, hyperplane_j) > 0 (quantized integer dot, so the
    DuckDB oracle is bit-exact). At scale this is the ANN partitioning
    function complementary to IVF: vectors are written bucketed by
    srp_bucket and a query probes its own (and Hamming-adjacent) buckets —
    candidate generation never compares all pairs. The hyperplanes are
    literal constants, so the projection is a single narrow scan with no
    join at all."""
    planes = _srp_hyperplanes(n_bits, dim)
    emb = spread(emb)  # n_bits x dim multiplies per row — parallelize the map
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = f"array({', '.join(f'cast({v} as bigint)' for v in plane)})"
        proj = F.expr(
            f"aggregate(zip_with(embedding, {arr}, (x, y) -> "
            f"cast(round(cast(x as double) * 1000) as bigint) * y), "
            f"cast(0 as bigint), (acc, v) -> acc + v)"
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return emb.select("vec_id", bucket.alias("srp_bucket"))


def srp_bucket_sql(n_bits: int = 16, dim: int = 64) -> str:
    """DuckDB oracle for srp_buckets, generated from the SAME hyperplane
    constants (single source of truth)."""
    planes = _srp_hyperplanes(n_bits, dim)
    terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        proj = (
            f"(SELECT SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)"
            f" * ({arr})[i]) FROM range(1, {dim + 1}) t(i))"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END")
    fp = " + ".join(terms)
    return (
        f"SELECT vec_id, CAST({fp} AS BIGINT) AS srp_bucket "
        f"FROM embeddings ORDER BY vec_id"
    )


def ivf_query_topk(
    emb: DataFrame, query_vec_id: int = 0, n_cells: int = 16, k: int = 10
) -> DataFrame:
    """Top-k within the query's IVF cell (the 1/C-scan ANN path)."""
    assign = ivf_assign(emb, n_cells)
    qcell = assign.where(F.col("vec_id") == query_vec_id).select("cell")
    members = assign.join(F.broadcast(qcell), "cell", "left_semi").where(
        F.col("vec_id") != query_vec_id
    )
    q = emb.where(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("qe"))
    return (
        members.select("vec_id")
        .join(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", dot_q("embedding", "qe").alias("dot_q"))
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(k)
    )


def ann_recall_at_k(
    emb: DataFrame, n_cells: int = 16, k: int = 10, n_queries: int = 20
) -> DataFrame:
    """Recall@k of the IVF path against brute-force ground truth, per
    query — THE metric an ANN index is tuned by. Query panel = the
    ``n_queries`` vectors after the centroid seed set (deterministic, no
    RNG). Ground truth is exact top-k by quantized dot (brute side costs
    |panel| x corpus — the documented eval-on-a-panel shape: recall is
    always measured on a bounded sample, never the full query log);
    approximate side re-ranks only the query's IVF cell.

    Scale shape: the panel is a broadcast relation on both sides; the
    brute pass is one scan of the corpus x |panel| in-row dots with a
    per-qid top-k window (|panel| partitions, each corpus-sized — bounded
    by the panel you chose to pay for). Returns
    (qid, n_overlap, recall_milli = floor(1000 * overlap / k)) — exact
    integers, cross-engine stable."""
    from pyspark.sql import Window

    qs = emb.where(
        (F.col("vec_id") >= n_cells) & (F.col("vec_id") < n_cells + n_queries)
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))

    emb = spread(emb)  # |panel| dots per corpus row — the brute pass must
    # use every core (guide §2.5); identity at real scale
    w = Window.partitionBy("qid").orderBy(F.desc("dq"), "vec_id")
    truth = (
        emb.crossJoin(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "qid", dot_q("embedding", "qe").alias("dq"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id")
    )

    assign = ivf_assign(emb, n_cells)
    qcell = assign.join(
        F.broadcast(qs.select(F.col("qid").alias("vec_id"))), "vec_id", "left_semi"
    ).select(F.col("vec_id").alias("qid"), "cell")
    members = assign.join(F.broadcast(qcell), "cell").where(
        F.col("vec_id") != F.col("qid")
    )
    approx = (
        members.select("qid", "vec_id")
        .join(emb, "vec_id")
        .join(F.broadcast(qs), "qid")
        .select("qid", "vec_id", dot_q("embedding", "qe").alias("dq"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id")
    )

    ov = truth.join(approx, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count("*").alias("n")
    )
    return (
        qs.select("qid")
        .join(ov, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_overlap"),
            F.floor(F.lit(1000) * F.coalesce(F.col("n"), F.lit(0)) / F.lit(k))
            .cast("long")
            .alias("recall_milli"),
        )
    )


# quantized integer squared-euclidean distance of two array<long> columns
_DIST_SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)


def _quantize(col: str):
    """array<float> -> array<bigint> milli components (exact cross-engine)."""
    return F.expr(
        f"transform({col}, x -> cast(round(cast(x as double) * 1000) as bigint))"
    )


def kmeans_refine(
    emb: DataFrame, n_cells: int = 16, rounds: int = 2
) -> DataFrame:
    """Lloyd-refined k-means over the embedding column — the iterative
    counterpart of the one-shot ``ivf_assign``: seed centroids are the
    first ``n_cells`` vectors, then ``rounds`` iterations of
    (assign by squared-euclidean argmin, ties to the lowest cell) ->
    (centroid = per-dimension ROUND(AVG) over members; an empty cell
    keeps its previous centroid). Returns the final (vec_id, cell,
    dist_q) assignment.

    Cross-engine determinism: components are milli-quantized BIGINTs, so
    distances are exact integers; centroid means are single divisions of
    exact integer sums (both engines land on the identical double, then
    the identical ROUND), so a 2-round DuckDB CTE unrolling reproduces
    the result bit-for-bit — an ITERATIVE operator with an exact oracle.

    Scale shape: per round, one broadcast of C centroids + one min_by
    hash-aggregate (map-side combine, no window sort) for assignment, one
    posexplode->hash-aggregate for the new centroids (C x dim tiny
    output). Rounds are statically unrolled into the plan; no driver-side
    data, no Python."""
    q = spread(emb).select("vec_id", _quantize("embedding").alias("qe"))
    cents = q.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("qe").alias("ce")
    )
    assign = None
    for _r in range(rounds):
        scored = q.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "cell",
            F.expr(_DIST_SQ.format(a="qe", b="ce")).alias("dist_q"),
        )
        assign = (
            scored.groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("cell", "dist_q"), F.struct("dist_q", "cell")
                ).alias("_b")
            )
            .select(
                "vec_id",
                F.col("_b.cell").alias("cell"),
                F.col("_b.dist_q").alias("dist_q"),
            )
        )
        if _r == rounds - 1:
            break
        comp = (
            assign.join(q, "vec_id")
            .select("cell", F.posexplode("qe").alias("i", "v"))
            .groupBy("cell", "i")
            .agg(F.round(F.avg("v")).cast("long").alias("cv"))
        )
        new_c = comp.groupBy("cell").agg(
            F.expr("transform(array_sort(collect_list(struct(i, cv))), s -> s.cv)").alias(
                "nce"
            )
        )
        # empty cells keep their previous centroid
        cents = cents.join(new_c, "cell", "left").select(
            "cell", F.coalesce(F.col("nce"), F.col("ce")).alias("ce")
        )
    return assign


def semdedup(
    emb: DataFrame, n_cells: int = 16, tau_milli: int = 900
) -> DataFrame:
    """SemDeDup-style semantic deduplication [Abbas et al. 2023,
    arXiv:2303.09540]: cluster the embeddings, then within each cluster
    drop every vector whose cosine similarity to a LOWER-id cluster member
    is >= tau. Returns one row per vector:
    (vec_id, cell, n_near, dropped) — n_near = how many lower-id in-cell
    neighbors cleared the threshold, dropped = 1 iff n_near > 0.

    Cross-engine exactness (no sqrt, no doubles): components are
    CENTI-quantized BIGINTs (round(x*100)), so dot products and squared
    norms are exact integers, and `cos(a,b) >= tau_milli/1000` is
    evaluated as

        dot > 0  AND  1e6 * dot^2 >= tau_milli^2 * |a|^2 * |b|^2

    — pure int64 arithmetic. Overflow bound: with |x| <= 2.0 and dim 64,
    dot <= 64*200^2 = 2.56e6, so 1e6*dot^2 <= 6.6e18 < 2^63. (Centi, not
    milli like dot_q: milli would overflow the squared comparison.)

    Scale shape (the 100 TB story): assignment is a broadcast of C
    centroids + max_by hash-aggregate (ivf_assign); the screen is an
    equi-join on `cell` — pairwise ONLY within a cluster, never across
    the corpus. That within-cluster quadratic IS the SemDeDup algorithm;
    at scale C grows with n (the paper uses 11k clusters for LAION) so
    the per-cluster block stays bounded, and the cell key is exactly the
    shuffle partitioner. Seed cells here come from ivf_assign's
    deterministic seed set; a production run would feed kmeans_refine's
    trained cells through the identical screen."""
    assign = ivf_assign(emb, n_cells).select("vec_id", "cell")
    q = spread(emb).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 100) as bigint))"
        ).alias("qe"),
    )
    v = q.join(assign, "vec_id").select(
        "vec_id",
        "cell",
        "qe",
        F.expr(
            "aggregate(transform(qe, x -> x * x), cast(0 as bigint), (a, x) -> a + x)"
        ).alias("n2"),
    )
    a = v.select(
        F.col("vec_id").alias("va"),
        "cell",
        F.col("qe").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = v.select(
        F.col("vec_id").alias("vb"),
        "cell",
        F.col("qe").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    tau2 = tau_milli * tau_milli
    hits = (
        a.join(b, "cell")
        .where(F.col("va") < F.col("vb"))
        .select(
            "vb",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("dot"),
            "na2",
            "nb2",
        )
        .where(
            (F.col("dot") > 0)
            & (
                F.lit(1000000).cast("long") * F.col("dot") * F.col("dot")
                >= F.lit(tau2).cast("long") * F.col("na2") * F.col("nb2")
            )
        )
        .groupBy("vb")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        v.join(hits, v.vec_id == hits.vb, "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
            (F.coalesce(F.col("n_near"), F.lit(0)) > 0).cast("int").alias("dropped"),
        )
    )


def pq_encode(emb: DataFrame, m: int = 8, dsub: int = 8, k: int = 16) -> DataFrame:
    """Product-quantization encoding [Jégou et al. 2011]: split the
    64-dim vector into m=8 contiguous dsub=8-dim subvectors; per subspace
    the codebook is the matching subvector of the first k vectors (the
    same deterministic seed convention as ivf_assign); each subvector is
    assigned its nearest codeword by EXACT integer squared distance on
    milli-quantized components (ties to the lowest code). Returns one row
    per (vec_id, sub) with the chosen ``code`` — the m-byte code a 100 TB
    store would persist instead of the raw floats (64 floats -> 8 bytes,
    a 32x memory cut, which is the entire point of PQ at scale).

    Scale shape: the codebook relation is m*k rows (128) — broadcast; the
    data side is an in-row posexplode (m rows per vector, no shuffle) and
    the argmin is a min_by hash-aggregate with map-side combine. One
    narrow shuffle on (vec_id, sub), nothing pairwise."""
    to_milli = "transform({c}, x -> cast(round(cast(x as double) * 1000) as bigint))"
    sv = spread(emb).select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        to_milli.format(
                            c=f"slice(embedding, {j * dsub + 1}, {dsub})"
                        )
                    )
                    for j in range(m)
                ]
            )
        ).alias("sub", "v"),
    )
    cb = sv.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("code"), "sub", F.col("v").alias("cw")
    )
    d = F.expr(
        "aggregate(zip_with(v, cw, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, e) -> acc + e)"
    )
    return (
        sv.join(F.broadcast(cb), "sub")
        .select("vec_id", "sub", "code", d.alias("d"))
        .groupBy("vec_id", "sub")
        .agg(F.min_by(F.col("code"), F.struct(F.col("d"), F.col("code"))).alias("code"))
        .select("vec_id", F.col("sub").cast("int").alias("sub"), "code")
    )


def pq_adc_topk(
    emb: DataFrame, query_vec_id: int = 0, m: int = 8, dsub: int = 8,
    k_codes: int = 16, k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes [Jégou et al. 2011 §III]:
    the query stays UNquantized (well, milli-exact) and scans only the
    m-byte codes — distance estimate = sum over subspaces of
    d(query_sub, codeword[code]). The per-query lookup table is m*k rows
    (128) — broadcast; the scan side touches codes only, never the raw
    vectors: at 100 TB this is the operator that reads 8 bytes/vector
    instead of 256. Exact integer arithmetic end-to-end, ties to the
    lowest vec_id. Returns (vec_id, adc_dist_q) ascending."""
    codes = pq_encode(emb, m=m, dsub=dsub, k=k_codes)
    to_milli = "transform({c}, x -> cast(round(cast(x as double) * 1000) as bigint))"
    sv = spread(emb).select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        to_milli.format(
                            c=f"slice(embedding, {j * dsub + 1}, {dsub})"
                        )
                    )
                    for j in range(m)
                ]
            )
        ).alias("sub", "v"),
    )
    cb = sv.where(F.col("vec_id") < k_codes).select(
        F.col("vec_id").cast("int").alias("code"), "sub", F.col("v").alias("cw")
    )
    qs = sv.where(F.col("vec_id") == query_vec_id).select(
        "sub", F.col("v").alias("qv")
    )
    d = F.expr(
        "aggregate(zip_with(qv, cw, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, e) -> acc + e)"
    )
    lut = qs.join(cb, "sub").select("sub", "code", d.alias("d"))
    return (
        codes.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist_q"))
        .orderBy(F.col("adc_dist_q").asc(), F.col("vec_id").asc())
        .limit(k)
    )
