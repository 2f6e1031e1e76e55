"""Katz + weighted PageRank vs exact python simulators."""

from decimal import ROUND_HALF_UP, Decimal

import pytest

from hoover_spark.operators.centrality import katz, weighted_pagerank
from hoover_spark.operators.graph import Graph
from hoover_spark.sources.synthetic import edges_to_pairs, rmat_graph
from pyspark.sql import functions as F




def _r6(x):
    """Spark/DuckDB round(x, 6): half AWAY from zero on the double's
    value — python's built-in round() is half-even and diverges on the
    exact ties katz's alpha=1/8 systematically produces."""
    return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _clean(pairs):
    return sorted({(s, d) for s, d in pairs if s != d})


def _katz_oracle(pairs, alpha, beta, iters):
    es = _clean(pairs)
    verts = sorted({v for e in es for v in e})
    x = {v: beta for v in verts}
    for _ in range(iters):
        s = {v: 0.0 for v in verts}
        for u, v in es:
            s[v] += x[u]
        x = {v: _r6(alpha * s[v] + beta) for v in verts}
    return x


def _wpr_oracle(pairs, wfn, d, iters):
    es = _clean(pairs)
    verts = sorted({v for e in es for v in e})
    n = len(verts)
    st = {}
    for u, v in es:
        st[u] = st.get(u, 0) + wfn(u, v)
    r = {v: _r6(1.0 / n) for v in verts}
    for _ in range(iters):
        m = {v: 0.0 for v in verts}
        for u, v in es:
            m[v] += r[u] * (wfn(u, v) / st[u])
        dm = sum(r[v] for v in verts if v not in st)
        r = {
            v: _r6((1.0 - d) / n + d * (m[v] + dm / n)) for v in verts
        }
    return r


def test_katz_rmat_round_exact(spark):
    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    for iters in (1, 2, 3):
        got = {r["vid"]: r["katz"] for r in katz(g, n_iterations=iters).collect()}
        want = _katz_oracle(pairs, 0.125, 1.0, iters)
        assert got == want, f"iters={iters}"


def test_katz_no_inedges_stays_beta(spark):
    g = Graph(
        spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long"),
        num_partitions=2,
    )
    got = {r["vid"]: r["katz"] for r in katz(g, n_iterations=3).collect()}
    assert got[1] == 1.0  # source-only vertex holds beta
    assert got[3] > got[2] > got[1]


def test_weighted_pagerank_round_exact(spark):
    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    wcol = (F.col("src") + F.col("dst")) % 5 + 1
    for iters in (1, 2):
        got = {
            r["vid"]: r["rank"]
            for r in weighted_pagerank(g, wcol, n_iterations=iters).collect()
        }
        want = _wpr_oracle(pairs, lambda u, v: (u + v) % 5 + 1, 0.85, iters)
        assert got == want, f"iters={iters}"


def test_weighted_pagerank_dangling_mass(spark):
    # vertex 3 is dangling (no out-edges); total rank must stay ~1
    g = Graph(
        spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long"),
        num_partitions=2,
    )
    rows = weighted_pagerank(
        g, F.lit(1).cast("long"), n_iterations=3
    ).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)
    got = {r["vid"]: r["rank"] for r in rows}
    want = _wpr_oracle(
        [(1, 2), (2, 3), (1, 3)], lambda u, v: 1, 0.85, 3
    )
    assert got == want


def test_weighted_vs_uniform_weights_degenerate(spark):
    """With all weights equal, weighted PageRank must equal the
    unweighted update (same transition matrix)."""
    g = rmat_graph(spark, scale=5, edge_factor=4)
    pairs = edges_to_pairs(g)
    got = {
        r["vid"]: r["rank"]
        for r in weighted_pagerank(g, F.lit(7).cast("long"), n_iterations=2).collect()
    }
    want = _wpr_oracle(pairs, lambda u, v: 1, 0.85, 2)
    assert got == want
