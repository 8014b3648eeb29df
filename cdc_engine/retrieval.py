"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
semantic (embedding ANN) ranked list [Cormack et al. 2009, RRF].

At web scale the two retrievers run as separate keyed pipelines (BM25's
query-sized tf/df relations, ANN's cell/bucket-pruned scan) and fusion
touches only the two TOP-K lists — constant-sized relations regardless
of corpus size, so the fuse step is a broadcast-broadcast join no matter
how large the table that produced them. The doc_id == vec_id identity is
the corpus convention (documents[i]'s embedding is embeddings row i).

Determinism: RRF contributions are EXACT integer parts-per-million
(1_000_000 // (c + rank) — integer division, no doubles anywhere), so
the fused ranking is bit-identical cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Fuse two ranked lists into a top-k by reciprocal-rank fusion.

    ``lex`` must carry (doc_id, score_milli) — ranked desc by
    (score_milli, doc_id asc); ``sem`` must carry (vec_id, dot_q) —
    ranked desc by (dot_q, vec_id asc). Returns
    (doc_id, lex_rank, sem_rank, rrf_ppm) top-k by (rrf_ppm desc,
    doc_id asc); a doc absent from one list contributes only the other
    list's term and reports rank 0 for the missing side.

    The rank windows here are single-partition by construction — both
    inputs are already LIMITed top-k lists (tiny), so the global window
    is a constant-size operation, not a scale hazard."""
    lw = Window.orderBy(F.col("score_milli").desc(), F.col("doc_id").asc())
    sw = Window.orderBy(F.col("dot_q").desc(), F.col("vec_id").asc())
    lr = lex.select("doc_id", F.row_number().over(lw).alias("lex_rank"))
    sr = sem.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(sw).alias("sem_rank")
    )
    fused = (
        lr.join(sr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("int").alias("sem_rank"),
        )
        .withColumn(
            "rrf_ppm",
            (
                F.when(
                    F.col("lex_rank") > 0,
                    F.expr(f"cast(1000000 div ({c} + lex_rank) as bigint)"),
                ).otherwise(F.lit(0).cast("long"))
                + F.when(
                    F.col("sem_rank") > 0,
                    F.expr(f"cast(1000000 div ({c} + sem_rank) as bigint)"),
                ).otherwise(F.lit(0).cast("long"))
            ),
        )
    )
    return fused.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc()).limit(k)
