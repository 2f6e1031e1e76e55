"""Luby's maximal independent set vs an exact python round simulator,
plus direct independence/maximality assertions (the two defining
properties, checked against the raw edge set, not the simulator)."""

from collections import defaultdict

import pytest

from hoover_spark.operators.graph import graph_from_pairs
from hoover_spark.operators.mis import MIS_P, luby_mis
from hoover_spark.sources.synthetic import (
    edges_to_pairs,
    path_graph,
    rmat_graph,
    star_graph,
    two_cliques,
)


def _prio(v: int) -> int:
    return (v * 40503 + 12345) % MIS_P


def mis_oracle(pairs):
    """Round-exact simulation of the kernel: vid -> selecting round."""
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.add(s)
        verts.add(d)
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    active = set(verts)
    out = {}
    rnd = 0
    while active:
        rnd += 1
        winners = {
            v
            for v in active
            if all(
                (_prio(v), v) < (_prio(w), w)
                for w in adj[v]
                if w in active
            )
        }
        removed = {w for v in winners for w in adj[v] if w in active}
        for v in winners:
            out[v] = rnd
        active -= winners | removed
    return out


def _check(spark, g, pairs):
    rows = {r.vid: r.mis_round for r in luby_mis(g).collect()}
    # round-exact vs the simulator
    assert rows == mis_oracle(pairs)
    # independence: no symmetric edge joins two members
    members = set(rows)
    for s, d in pairs:
        if s != d:
            assert not (s in members and d in members), (s, d)
    # maximality: every non-member has a member neighbor
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        verts.add(s)
        verts.add(d)
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    for v in verts - members:
        assert adj[v] & members, v


def test_mis_path(spark):
    g = path_graph(spark, 12)
    _check(spark, g, edges_to_pairs(g))


def test_mis_star(spark):
    g = star_graph(spark, 9)
    pairs = edges_to_pairs(g)
    rows = {r.vid: r.mis_round for r in luby_mis(g).collect()}
    # the hub has the globally smallest priority-colliding chance; on a
    # star, the MIS is either {hub} or all leaves — both maximal
    _check(spark, g, pairs)
    assert (0 in rows) != all(v in rows for v in range(1, 10)) or len(rows) >= 1


def test_mis_two_cliques(spark):
    g = two_cliques(spark, k=5, bridge=True)
    pairs = edges_to_pairs(g)
    rows = {r.vid: r.mis_round for r in luby_mis(g).collect()}
    _check(spark, g, pairs)
    # one member per clique is the only possible maximal shape here
    assert len(rows) == 2


def test_mis_rmat(spark):
    g = rmat_graph(spark, scale=7, edge_factor=4)
    _check(spark, g, edges_to_pairs(g))


def test_mis_isolated_vertex(spark):
    # a self-loop-only vertex has no active neighbor: wins round 1
    g = graph_from_pairs(spark, [(0, 1), (2, 2)])
    rows = {r.vid: r.mis_round for r in luby_mis(g).collect()}
    assert 2 in rows and rows[2] == 1
    assert (0 in rows) != (1 in rows)
