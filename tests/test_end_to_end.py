"""M0 end-to-end slice: repos table → edge extraction → WCC labels
checked exactly against union-find (SURVEY.md §7.2)."""

from hoover_spark.operators.graph import Graph
from hoover_spark.operators.wcc import wcc
from hoover_spark.sources import repos as R
from tests.oracles import union_find_components


def test_repos_to_wcc(spark):
    t = R.repos_table(spark, 500, num_partitions=4).persist()
    edges = R.ref_edges(t).persist()
    g = Graph(edges, num_partitions=8)

    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    want = union_find_components(pairs)

    got = {r["vid"]: r["label"] for r in wcc(g).collect()}
    assert got == want
    assert len(got) > 0
