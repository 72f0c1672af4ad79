"""connected_components (large-star/small-star) vs a union-find reference.

The driver-gated form (dedup_clusters_documents) proves the full edge
pipeline against a DuckDB recursive CTE; these tests pin the contraction
algorithm itself on adversarial graph shapes the sf0.01 corpus can't
guarantee: long chains (propagation worst case), cliques, dup/reversed/
self-loop input edges, isolated nodes, and seeded random graphs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.cluster import (
    canonical_assignments,
    connected_components,
)


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: union-find, component labeled by its min node id."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def _cc_spark(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df).collect()
    return {int(r["node"]): int(r["component"]) for r in out}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    got = _cc_spark(spark, edges)
    ref = _uf_components(n, edges)
    touched = {a for e in edges for a in e}
    assert got.keys() == touched
    for node in touched:
        assert got[node] == ref[node], node


def test_long_chain_converges(spark):
    # propagation worst case: 0-1-2-...-63 is ONE component rooted at 0
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_cliques_and_messy_input(spark):
    # two cliques {0..4}, {10..13}; input has dups, reversals, self-loops
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = clique(range(5)) + clique(range(10, 14))
    edges += [(b, a) for a, b in edges] + [(3, 3), (11, 11)] + edges[:4]
    got = _cc_spark(spark, edges)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src: long, dst: long")
    assert connected_components(df).count() == 0


def test_canonical_assignments_singletons_and_clusters(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "doc_a: long, doc_b: long"
    )
    rows = {
        int(r["doc_id"]): (int(r["cluster_id"]), int(r["keep"]))
        for r in canonical_assignments(docs, pairs).collect()
    }
    assert len(rows) == 10
    # cluster {1,4,7} -> 1 survives; {2,9} -> 2 survives
    assert rows[1] == (1, 1) and rows[4] == (1, 0) and rows[7] == (1, 0)
    assert rows[2] == (2, 1) and rows[9] == (2, 0)
    # everything else is its own singleton cluster and kept
    for d in (0, 3, 5, 6, 8):
        assert rows[d] == (d, 1)


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src: long, dst: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=1)
