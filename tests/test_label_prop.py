"""Label propagation vs synchronous python oracles (exact per-iteration)."""

from hoover_spark.operators.label_prop import min_label_propagation, mode_label_propagation
from hoover_spark.sources.synthetic import (
    edges_to_pairs,
    path_graph,
    rmat_graph,
    two_cliques,
)
from tests.oracles import min_label_propagation_oracle, mode_label_propagation_oracle


def labels_of(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def test_min_lp_iteration_trace(spark):
    """Bounded min-LP must match the reference's synchronous semantics
    at every iteration count (the trace-diff methodology)."""
    g = path_graph(spark, 12)
    pairs = edges_to_pairs(g)
    for k in (1, 2, 3):
        got = labels_of(min_label_propagation(g, n_iterations=k))
        assert got == min_label_propagation_oracle(pairs, k), f"iter={k}"


def test_min_lp_rmat(spark):
    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    got = labels_of(min_label_propagation(g, n_iterations=2))
    assert got == min_label_propagation_oracle(pairs, 2)


def test_mode_lp_matches_oracle(spark):
    g = two_cliques(spark, 4, bridge=True)
    pairs = edges_to_pairs(g)
    for k in (1, 2, 4):
        got = labels_of(mode_label_propagation(g, n_iterations=k))
        assert got == mode_label_propagation_oracle(pairs, k), f"iter={k}"


def test_mode_lp_finds_two_communities(spark):
    """Two K_6 cliques joined by one bridge: mode-LP should settle into
    two communities."""
    from hoover_spark.sources.synthetic import clique_graph
    from hoover_spark.operators.graph import Graph

    g1 = clique_graph(spark, 6, offset=0).edges
    g2 = clique_graph(spark, 6, offset=6).edges
    bridge = spark.createDataFrame([(5, 6)], schema="src long, dst long")
    g = Graph(g1.unionByName(g2).unionByName(bridge), num_partitions=8)
    got = labels_of(mode_label_propagation(g, n_iterations=8))
    communities = set(got.values())
    assert len(communities) == 2
    assert len({got[v] for v in range(6)}) == 1
    assert len({got[v] for v in range(6, 12)}) == 1
