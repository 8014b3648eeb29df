"""graphops.pagerank: integer-exact power iteration."""

from __future__ import annotations

from cdc_engine.graphops import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_milli"] for r in pagerank(df, **kw).collect()}


def test_pagerank_one_round_hand_computed(spark):
    # a(1)->b(2), a->c(3), b->c, c->a; deg: a=2 b=1 c=1; r0=1000
    # r1(a)=150+850*1000//1000=1000; r1(b)=150+850*(1000//2)//1000=575;
    # r1(c)=150+850*(500+1000)//1000=1425
    got = _ranks(spark, [(1, 2), (1, 3), (2, 3), (3, 1)], iterations=1)
    assert got == {1: 1000, 2: 575, 3: 1425}


def test_pagerank_self_loops_and_dup_edges_ignored(spark):
    base = _ranks(spark, [(1, 2), (1, 3), (2, 3), (3, 1)], iterations=2)
    noisy = _ranks(
        spark,
        [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (2, 2)],
        iterations=2,
    )
    assert noisy == base


def test_pagerank_partition_invariant(spark):
    edges = [(i % 7, (3 * i + 1) % 7) for i in range(40)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {r["node"]: r["rank_milli"] for r in pagerank(df1, iterations=3).collect()}
    r8 = {r["node"]: r["rank_milli"] for r in pagerank(df8, iterations=3).collect()}
    assert r1 == r8  # integer floors => no float drift across partitionings
