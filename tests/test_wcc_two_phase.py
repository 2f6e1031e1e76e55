"""Two-phase WCC (local union-find contraction + hash-min) must agree
exactly with single-phase WCC and the union-find oracle."""

from __future__ import annotations

from hoover_spark.operators.wcc import local_contract, wcc, wcc_two_phase
from hoover_spark.sources.synthetic import (
    edges_to_pairs,
    path_graph,
    rmat_graph,
    two_cliques,
)
from tests.oracles import union_find_components


def _check(g):
    oracle = union_find_components(edges_to_pairs(g))
    got = {r["vid"]: r["label"] for r in wcc_two_phase(g).collect()}
    assert got == oracle


def test_two_phase_path(spark):
    _check(path_graph(spark, 50))


def test_two_phase_cliques(spark):
    _check(two_cliques(spark, k=4, bridge=False))


def test_two_phase_rmat(spark):
    g = rmat_graph(spark, scale=8, edge_factor=4)
    oracle = {r["vid"]: r["label"] for r in wcc(g).collect()}
    got = {r["vid"]: r["label"] for r in wcc_two_phase(g).collect()}
    assert got == oracle


def test_local_contract_is_conservative(spark):
    """Contraction must never merge vertices from different true
    components (roots refine the oracle partition)."""
    g = two_cliques(spark, k=4, bridge=False)
    oracle = union_find_components(edges_to_pairs(g))
    mapping = {r["vid"]: r["root"] for r in local_contract(g.sym_edges(), 4).collect()}
    for v, r in mapping.items():
        assert oracle[v] == oracle[r]
