from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyreshaper_spark.operators.cluster import (
    components_with_size,
    connected_components,
    dedup_survivors,
    survivor_flags,
)
from tests.conftest import rows_set


def _uf_components(edges):
    """Reference union-find: {node: min-node-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _pseudo_random_edges(n_nodes: int, n_edges: int, salt: str):
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    edges = []
    for i in range(n_edges):
        a = nodes[_h(f"{salt}a{i}") % n_nodes]
        b = nodes[_h(f"{salt}b{i}") % n_nodes]
        if a != b:
            edges.append((a, b))
    return edges


def _check(spark, edges):
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_cc_matches_union_find_random(spark):
    _check(spark, _pseudo_random_edges(60, 45, "g1"))
    _check(spark, _pseudo_random_edges(40, 120, "g2"))  # dense, one blob


def test_cc_path_graph_converges_in_log_rounds(spark):
    # a 64-node chain: worst case for naive label propagation (64
    # rounds); star-contraction must finish inside the round budget
    edges = [(f"p{i:03d}", f"p{i + 1:03d}") for i in range(63)]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = connected_components(df, max_rounds=12)
    assert got.filter(F.col("component") != "p000").count() == 0
    assert got.count() == 64


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [("b", "a"), ("a", "b"), ("b", "a"), ("c", "c"), ("d", "c")]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = rows_set(connected_components(df))
    assert got == {("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(df).count() == 0


def test_components_with_size(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = rows_set(components_with_size(df))
    assert got == {
        ("a", "a", "3"), ("b", "a", "3"), ("c", "a", "3"),
        ("x", "x", "2"), ("y", "x", "2"),
    }


def test_cc_property_random_graphs(spark):
    """Hypothesis sweep: star contraction ≡ union-find on arbitrary
    small graphs (including multi-edges, self-loops filtered upstream,
    disconnected blobs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=19).map(lambda i: f"v{i:02d}")
    edges_strategy = st.lists(
        st.tuples(node, node), min_size=1, max_size=40
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(edges=edges_strategy)
    def run(edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        _check(spark, edges)

    run()


def test_survivors(spark):
    docs = spark.createDataFrame(
        [(d, "s0", "t") for d in ["a", "b", "c", "x", "y", "z"]],
        "doc_id string, source string, text string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    kept = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert kept == {"a", "x", "z"}
    flags = {
        r["doc_id"]: r["kept"] for r in survivor_flags(docs, pairs).collect()
    }
    assert flags == {
        "a": True, "b": False, "c": False,
        "x": True, "y": False, "z": True,
    }
