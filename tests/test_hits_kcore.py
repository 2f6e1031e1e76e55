"""HITS and k-core vs driver-side python oracles (exact semantics)."""

import pytest

from hoover_spark.operators.graph import Graph
from hoover_spark.operators.hits import hits
from hoover_spark.operators.kcore import kcore
from hoover_spark.sources.synthetic import (
    clique_graph,
    edges_to_pairs,
    path_graph,
    rmat_graph,
    star_graph,
    two_cliques,
)
from tests.oracles import hits_oracle, kcore_oracle


def test_hits_star(spark):
    """Star center must become the sole authority (spokes point at it)."""
    g = star_graph(spark, 8)  # edges spoke -> center? verify directions below
    pairs = edges_to_pairs(g)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in hits(g, n_iterations=3).collect()}
    hub_o, auth_o = hits_oracle(pairs, 3)
    assert set(got) == set(hub_o)
    for v in got:
        assert got[v][0] == pytest.approx(hub_o[v], abs=1e-9)
        assert got[v][1] == pytest.approx(auth_o[v], abs=1e-9)


def test_hits_iteration_trace(spark):
    """Bounded-iteration HITS must match the synchronous oracle at every
    iteration count (trace-diff methodology, like min-LP)."""
    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    for k in (1, 2):
        got = {r["vid"]: (r["hub"], r["auth"]) for r in hits(g, n_iterations=k).collect()}
        hub_o, auth_o = hits_oracle(pairs, k)
        for v in got:
            assert got[v][0] == pytest.approx(hub_o[v], abs=1e-9), f"hub iter={k}"
            assert got[v][1] == pytest.approx(auth_o[v], abs=1e-9), f"auth iter={k}"


def test_hits_bipartite_zero_sides(spark):
    """On a pure bipartite src->dst graph, dsts have hub 0 and srcs have
    auth 0 — the dangling coverage the left-join/coalesce guards."""
    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (3, 103)], schema="src long, dst long"
    )
    g = Graph(edges, num_partitions=4)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in hits(g, n_iterations=2).collect()}
    for v in (101, 102, 103):
        assert got[v][0] == 0.0
    for v in (1, 2, 3):
        assert got[v][1] == 0.0
    # vertex 1 references the most-referenced target -> top hub
    assert got[1][0] == max(h for h, _ in got.values())
    assert got[101][1] == max(a for _, a in got.values())


def test_kcore_clique_plus_tail(spark):
    """K_5 with a path tail: the 4-core is exactly the clique, each
    member at in-core degree 4; the tail peels away."""
    k5 = clique_graph(spark, 5, offset=0).edges
    tail = spark.createDataFrame([(4, 5), (5, 6), (6, 7)], schema="src long, dst long")
    g = Graph(k5.unionByName(tail), num_partitions=4)
    got = {r["vid"]: r["core_degree"] for r in kcore(g, k=4).collect()}
    assert got == {v: 4 for v in range(5)}


def test_kcore_matches_oracle(spark):
    for fixture in (
        rmat_graph(spark, scale=6, edge_factor=4),
        two_cliques(spark, 5, bridge=True),
        path_graph(spark, 10),
    ):
        pairs = edges_to_pairs(fixture)
        for k in (2, 3):
            got = {r["vid"]: r["core_degree"] for r in kcore(fixture, k=k).collect()}
            assert got == kcore_oracle(pairs, k), f"k={k}"


def test_kcore_empty_when_overdemanding(spark):
    g = path_graph(spark, 6)  # max sym degree 2
    assert kcore(g, k=3).count() == 0
