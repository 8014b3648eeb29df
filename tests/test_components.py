"""connected_components structure tests (beyond the contract's
recursive-CTE oracle): convergence on multi-hop paths, disjoint
components, and that only edge-endpoint nodes appear."""

from __future__ import annotations

from cdc_engine.dedup_text import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_path_graph_converges_to_min(spark):
    # diameter 3: label 1 must propagate three hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_disjoint(spark):
    got = _cc(spark, [(5, 6), (10, 11), (11, 12)])
    assert got == {5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_direction_and_order_irrelevant(spark):
    # same component regardless of edge direction or insertion order
    got = _cc(spark, [(9, 3), (3, 7), (7, 1)])
    assert got == {1: 1, 3: 1, 7: 1, 9: 1}


def test_only_edge_nodes_appear(spark):
    got = _cc(spark, [(2, 4)])
    assert set(got) == {2, 4}


def test_string_node_ids(spark):
    got = _cc(spark, [("doc_b", "doc_c"), ("doc_a", "doc_b")])
    assert got == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a"}
