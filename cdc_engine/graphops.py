"""Graph analytics over DataFrames: deterministic integer PageRank.

Domain-authority scoring for a web corpus (which hosts to crawl deeper,
which to downweight in the training mix) is a power iteration over the
link graph. This is the canonical Pregel-on-DataFrames shape: each round
is ONE join (rank onto edges by src) + ONE keyed aggregate (contributions
by dst) — both hash-partitioned on the node key, map-side combinable,
nothing global. At 100 TB the edge relation dominates; it is scanned once
per round and never collected.

Determinism: ranks are integer milli-units and every division is FLOOR
integer division (Spark `DIV`, DuckDB `//` — identical on non-negative
operands), so an N-round run is bit-identical across engines, partition
counts and cluster sizes; the DuckDB oracle statically unrolls the same
rounds (contract.py `pagerank_domains`), the same exact-oracle treatment
kmeans_refine got for clustering.

Like dedup_text.connected_components, lineage grows linearly with rounds
— callers iterating deep should checkpoint every ~10 rounds; the
contract query runs the standard 2-round form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    base_milli: int = 150,
    damp_milli: int = 850,
) -> DataFrame:
    """Integer-exact PageRank over distinct (src, dst) edges.

    rank_0 = 1000 for every node appearing in the edge list;
    rank_{t+1}(v) = base + (damp * sum_{u->v} (rank_t(u) DIV deg(u))) DIV 1000.

    Simplified-variant semantics, stated: dangling mass is dropped (a
    node with no out-edges contributes nothing) and isolated nodes are
    absent (nodes exist only via edges) — the ranking ORDER matches the
    classic formulation on link graphs, which is what the authority
    use-case consumes."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    rank = nodes.withColumn("rank_milli", F.lit(1000).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(rank, e["src"] == rank["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("rank_milli DIV deg").alias("c"))
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = nodes.join(s, "node", "left").select(
            "node",
            (
                F.lit(base_milli)
                + F.expr(f"({damp_milli} * coalesce(s, 0L)) DIV 1000")
            )
            .cast("long")
            .alias("rank_milli"),
        )
    return rank
