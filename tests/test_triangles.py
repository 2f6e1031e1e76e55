"""Triangle counting vs brute-force oracle."""

from hoover_spark.operators.triangles import per_vertex_triangles, triangle_count
from hoover_spark.sources.synthetic import (
    clique_graph,
    cycle_graph,
    edges_to_pairs,
    path_graph,
    rmat_graph,
    star_graph,
    two_cliques,
)
from tests.oracles import per_vertex_triangles_oracle, triangle_count_oracle


def test_clique(spark):
    # C(6,3) = 20
    assert triangle_count(clique_graph(spark, 6)) == 20


def test_path_and_cycle_and_star(spark):
    assert triangle_count(path_graph(spark, 10)) == 0
    assert triangle_count(cycle_graph(spark, 10)) == 0
    assert triangle_count(star_graph(spark, 10)) == 0


def test_two_cliques(spark):
    g = two_cliques(spark, 4, bridge=False)
    assert triangle_count(g) == 8  # 2 * C(4,3)
    gb = two_cliques(spark, 4, bridge=True)
    assert triangle_count(gb) == 8  # bridge adds no triangle


def test_rmat_matches_oracle(spark):
    g = rmat_graph(spark, scale=7, edge_factor=6)
    assert triangle_count(g) == triangle_count_oracle(edges_to_pairs(g))


def test_per_vertex_matches_oracle(spark):
    g = rmat_graph(spark, scale=6, edge_factor=6)
    got = {r["vid"]: r["triangles"] for r in per_vertex_triangles(g).collect()}
    assert got == per_vertex_triangles_oracle(edges_to_pairs(g))


def test_per_vertex_clique(spark):
    got = {r["vid"]: r["triangles"] for r in per_vertex_triangles(clique_graph(spark, 5)).collect()}
    # every vertex of K5 is in C(4,2)=6 triangles
    assert got == {v: 6 for v in range(5)}
