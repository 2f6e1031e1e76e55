"""BFS hop distances, link prediction, reciprocity, degree histogram
vs driver-side python oracles (exact semantics)."""

import math
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from hoover_spark.operators.graph import (
    Graph,
    degree_histogram,
    graph_from_pairs,
    reciprocity,
)
from hoover_spark.operators.paths import bfs_hops, link_predict
from hoover_spark.sources.synthetic import (
    edges_to_pairs,
    path_graph,
    rmat_graph,
    star_graph,
    two_cliques,
)


def bfs_oracle(pairs, seeds, max_hops):
    """vid -> min hops, BFS over the symmetrized edge set."""
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] == max_hops:
            continue
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def link_predict_oracle(pairs, min_common=1):
    """(u, w) -> (common_neighbors, ra_score) over non-adjacent pairs."""
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for w in verts[i + 1 :]:
            if w in adj[u]:
                continue
            common = adj[u] & adj[w]
            if len(common) >= min_common:
                out[(u, w)] = (
                    len(common),
                    sum(1.0 / len(adj[v]) for v in common),
                )
    return out


def test_bfs_path_graph(spark):
    """On a path 0-1-…-9 with seed {0}, hops == vertex id up to the cap."""
    g = path_graph(spark, 10)
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {r["vid"]: r["hops"] for r in bfs_hops(g, seeds, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_multi_source_rmat(spark):
    g = rmat_graph(spark, scale=7, edge_factor=4)
    pairs = edges_to_pairs(g)
    seeds_py = sorted({v for e in pairs for v in e if v % 13 == 0})
    seeds = spark.createDataFrame([(v,) for v in seeds_py], "vid long")
    for cap in (1, 3):
        got = {r["vid"]: r["hops"] for r in bfs_hops(g, seeds, max_hops=cap).collect()}
        assert got == bfs_oracle(pairs, seeds_py, cap), f"max_hops={cap}"


def test_bfs_early_exit_when_frontier_drains(spark):
    """Two 4-cliques, no bridge: from a seed inside one clique the far
    clique is unreachable at ANY cap, and the loop stops early."""
    g = two_cliques(spark, k=4, bridge=False)
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {r["vid"]: r["hops"] for r in bfs_hops(g, seeds, max_hops=50).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == 0 and all(got[v] == 1 for v in (1, 2, 3))


def test_bfs_seed_not_in_graph(spark):
    """A seed id absent from the edge set reports hops 0 (valid query
    point, empty neighborhood)."""
    g = path_graph(spark, 4)
    seeds = spark.createDataFrame([(99,), (0,)], "vid long")
    got = {r["vid"]: r["hops"] for r in bfs_hops(g, seeds, max_hops=1).collect()}
    assert got[99] == 0 and got[0] == 0 and got[1] == 1


def test_link_predict_rmat(spark):
    g = rmat_graph(spark, scale=6, edge_factor=3)
    pairs = edges_to_pairs(g)
    want = link_predict_oracle(pairs, min_common=2)
    got = {
        (r["u"], r["w"]): (r["common_neighbors"], r["ra_score"])
        for r in link_predict(g, min_common=2).collect()
    }
    assert set(got) == set(want)
    for k, (cn, ra) in want.items():
        assert got[k][0] == cn
        assert got[k][1] == pytest.approx(ra, abs=1e-12)


def test_link_predict_star_scores(spark):
    """Star with hub 0 and leaves 1..5: every leaf pair shares exactly
    the hub, RA = 1/deg(hub) = 1/5; AA = 1/ln(5)."""
    g = star_graph(spark, 5)
    rows = link_predict(g, min_common=1, scores=("ra", "aa")).collect()
    assert len(rows) == 10  # C(5,2) leaf pairs
    for r in rows:
        assert r["common_neighbors"] == 1
        assert r["ra_score"] == pytest.approx(0.2, abs=1e-12)
        assert r["aa_score"] == pytest.approx(1.0 / math.log(5), abs=1e-12)


def test_link_predict_center_degree_cap(spark):
    """Capping out the hub removes all its wedges: the star yields no
    predictions when max_center_degree < deg(hub)."""
    g = star_graph(spark, 5)
    assert link_predict(g, max_center_degree=4).count() == 0


def test_reciprocity_counts(spark):
    """Directed fixture: 1→2, 2→1 (reciprocal pair), 1→3, 3→4."""
    g = graph_from_pairs(spark, [(1, 2), (2, 1), (1, 3), (3, 4)])
    row = reciprocity(g).collect()[0]
    assert row["m_edges"] == 4
    assert row["reciprocal_edges"] == 2
    assert row["reciprocity"] == pytest.approx(0.5)


def test_reciprocity_empty_graph(spark):
    g = graph_from_pairs(spark, [(1, 1)])  # only a self-loop -> cleaned empty
    row = reciprocity(g).collect()[0]
    assert row["m_edges"] == 0 and row["reciprocity"] == 0.0
    # SUM over zero rows is NULL unless coalesced at the agg level
    assert row["reciprocal_edges"] == 0


def test_degree_histogram_buckets(spark):
    """Star with 9 leaves: hub degree 9 -> bucket 3; leaves degree 1 ->
    bucket 0 (floor(log2(d+0.5)) never sits ON a power of two)."""
    g = star_graph(spark, 9)
    got = {r["bucket"]: r for r in degree_histogram(g).collect()}
    assert set(got) == {0, 3}
    assert got[0]["n_vertices"] == 9
    assert got[0]["min_degree"] == got[0]["max_degree"] == 1
    assert got[3]["n_vertices"] == 1
    assert got[3]["min_degree"] == 9


def test_degree_histogram_power_of_two_boundary(spark):
    """Degrees exactly at powers of two land in their own bucket:
    deg 8 -> bucket 3, deg 7 -> bucket 2."""
    # hub 0 with 8 leaves; hub 100 with 7 leaves
    pairs = [(0, i) for i in range(1, 9)] + [(100, 100 + i) for i in range(1, 8)]
    g = graph_from_pairs(spark, pairs)
    got = {(r["bucket"], r["max_degree"]) for r in degree_histogram(g).collect()}
    assert (3, 8) in got and (2, 7) in got


def walks_oracle(pairs, starts, walk_length, walks_per_vertex):
    """Replays the deterministic LCG walk in pure python."""
    P, A, B, C = 1_000_000_007, 40503, 69069, 12345
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    out = {}
    for v0 in starts:
        for r in range(walks_per_vertex):
            wid = v0 * walks_per_vertex + r
            v = v0
            out[(wid, 0)] = v
            for t in range(1, walk_length + 1):
                nbrs = sorted(adj[v])
                h = ((wid % P) * A + (v % P) * B + t * C + 7) % P
                v = nbrs[h % len(nbrs)]
                out[(wid, t)] = v
    return out


def test_random_walks_match_python_replay(spark):
    from hoover_spark.operators.paths import random_walks

    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    starts_py = sorted({v for e in pairs for v in e if v % 7 == 0})
    starts = spark.createDataFrame([(v,) for v in starts_py], "vid long")
    got = {
        (r["walk_id"], r["step"]): r["vid"]
        for r in random_walks(g, starts, walk_length=4, walks_per_vertex=2).collect()
    }
    assert got == walks_oracle(pairs, starts_py, 4, 2)


def test_random_walks_never_die(spark):
    """Every (walk, step) pair present: walks can't fall off the graph
    (symmetric view has deg >= 1 everywhere)."""
    from hoover_spark.operators.paths import random_walks

    g = path_graph(spark, 6)
    starts = spark.createDataFrame([(0,), (5,)], "vid long")
    rows = random_walks(g, starts, walk_length=5, walks_per_vertex=3).collect()
    assert len(rows) == 2 * 3 * 6  # starts x walks x (len+1) steps


def nf_oracle(pairs, h):
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    out = {}
    for v in adj:
        reach = {v}
        frontier = {v}
        for _ in range(h):
            frontier = {w for u in frontier for w in adj[u]} - reach
            reach |= frontier
        out[v] = len(reach)
    return out


def test_neighborhood_function_exact(spark):
    from hoover_spark.operators.paths import neighborhood_function

    g = rmat_graph(spark, scale=6, edge_factor=3)
    pairs = edges_to_pairs(g)
    for h in (1, 2):
        got = {r["vid"]: r["nf"] for r in neighborhood_function(g, h).collect()}
        assert got == nf_oracle(pairs, h), f"h={h}"


def test_hyperball_tracks_exact_nf(spark):
    """HLL sparse mode is near-exact at fixture cardinalities; at any
    scale the estimate must sit within HLL's rse envelope (~3% at
    lgk=12, take 10% slack)."""
    from hoover_spark.operators.paths import hyperball, neighborhood_function

    g = rmat_graph(spark, scale=7, edge_factor=4)
    exact = {r["vid"]: r["nf"] for r in neighborhood_function(g, 2).collect()}
    est = {r["vid"]: r["nf_estimate"] for r in hyperball(g, 2).collect()}
    assert set(est) == set(exact)
    for v, nf in exact.items():
        assert est[v] == pytest.approx(nf, rel=0.10), f"vid={v}"


def test_hyperball_h3_monotone(spark):
    """Estimates grow with h (balls are nested) and cap at |component|."""
    from hoover_spark.operators.paths import hyperball

    g = path_graph(spark, 8)
    e2 = {r["vid"]: r["nf_estimate"] for r in hyperball(g, 2).collect()}
    e3 = {r["vid"]: r["nf_estimate"] for r in hyperball(g, 3).collect()}
    for v in e2:
        assert e3[v] >= e2[v] - 1e-9
        assert e3[v] <= 8 * 1.1


def brandes_oracle(pairs, sources):
    """Textbook Brandes (2001) over the symmetrized graph, halved for
    undirected double counting; contributions only from `sources`."""
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    bc = {v: 0.0 for v in adj}
    for s in sources:
        stack, preds = [], defaultdict(list)
        sigma = defaultdict(int)
        dist = {s: 0}
        sigma[s] = 1
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(stack):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w] / 2.0
    return bc


def test_betweenness_all_sources_path(spark):
    """Path 0-1-2-3-4: exact bc = (0, 3, 4, 3, 0)."""
    from hoover_spark.operators.paths import betweenness

    g = path_graph(spark, 5)
    sources = spark.createDataFrame([(v,) for v in range(5)], "vid long")
    got = {r["vid"]: r["bc"] for r in betweenness(g, sources).collect()}
    assert got == pytest.approx({0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0})


def test_betweenness_sampled_rmat(spark):
    from hoover_spark.operators.paths import betweenness

    g = rmat_graph(spark, scale=6, edge_factor=3)
    pairs = edges_to_pairs(g)
    srcs = sorted({v for e in pairs for v in e if v % 5 == 0})
    sources = spark.createDataFrame([(v,) for v in srcs], "vid long")
    want = brandes_oracle(pairs, srcs)
    got = {r["vid"]: r["bc"] for r in betweenness(g, sources).collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), f"vid={v}"


def test_betweenness_star_hub(spark):
    """Star: the hub carries all C(n,2) pair paths; leaves carry 0."""
    from hoover_spark.operators.paths import betweenness

    g = star_graph(spark, 6)
    vids = [0] + list(range(1, 7))
    sources = spark.createDataFrame([(v,) for v in vids], "vid long")
    got = {r["vid"]: r["bc"] for r in betweenness(g, sources).collect()}
    assert got[0] == pytest.approx(15.0)  # C(6,2)
    for leaf in range(1, 7):
        assert got[leaf] == pytest.approx(0.0)


def test_modularity_two_cliques(spark):
    """Two disjoint 4-cliques, partition = component: I = m, D_c = 12
    each, Q = 1 - 2*(12/24)^2 = 0.5."""
    from hoover_spark.operators.communities import modularity

    g = two_cliques(spark, k=4, bridge=False)  # vertices 0..3 and 4..7
    labels = g.vertices().select(
        "vid", F.floor(F.col("vid") / 4).cast("long").alias("label")
    )
    row = modularity(g, labels).collect()[0]
    assert row["m_edges"] == 12 and row["intra_edges"] == 12
    assert row["modularity"] == pytest.approx(0.5)


def test_modularity_singleton_partition_is_negative(spark):
    """Every vertex its own community: I = 0, Q = -Σ deg²/(4m²) < 0."""
    from hoover_spark.operators.communities import modularity

    g = path_graph(spark, 4)  # degrees 1,2,2,1; m=3
    labels = g.vertices().select("vid", F.col("vid").alias("label"))
    row = modularity(g, labels).collect()[0]
    assert row["intra_edges"] == 0
    assert row["modularity"] == pytest.approx(-(1 + 4 + 4 + 1) / 36.0)


def test_harmonic_2hop_path(spark):
    """Path 0-1-2-3: hc(0) = 1 + 1/2 (strict 2-hop = {2}); hc(1) = 2 + 1/2."""
    from hoover_spark.operators.paths import harmonic_centrality_2hop

    g = path_graph(spark, 4)
    got = {r["vid"]: (r["n1"], r["n2"], r["hc"]) for r in harmonic_centrality_2hop(g).collect()}
    assert got[0] == (1, 1, pytest.approx(1.5))
    assert got[1] == (2, 1, pytest.approx(2.5))
    assert got[2] == (2, 1, pytest.approx(2.5))
    assert got[3] == (1, 1, pytest.approx(1.5))


def test_harmonic_2hop_matches_nf(spark):
    """hc must equal (nf1-1) + (nf2-nf1)/2 computed from the exact
    neighborhood function — two independent derivations."""
    from hoover_spark.operators.paths import (
        harmonic_centrality_2hop,
        neighborhood_function,
    )

    g = rmat_graph(spark, scale=6, edge_factor=3)
    nf1 = {r["vid"]: r["nf"] for r in neighborhood_function(g, 1).collect()}
    nf2 = {r["vid"]: r["nf"] for r in neighborhood_function(g, 2).collect()}
    got = {r["vid"]: r["hc"] for r in harmonic_centrality_2hop(g).collect()}
    for v in nf1:
        want = (nf1[v] - 1) + (nf2[v] - nf1[v]) / 2.0
        assert got[v] == pytest.approx(want), f"vid={v}"


def test_snapshot_diff_statuses(spark):
    from hoover_spark.operators.paths import snapshot_diff

    a = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    b = spark.createDataFrame([(2, 3), (3, 4), (9, 9)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["status"] for r in snapshot_diff(a, b).collect()}
    assert got == {
        (1, 2): "removed",
        (2, 3): "kept",
        (3, 4): "kept",
        (9, 9): "added",
    }
