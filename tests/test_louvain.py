"""Louvain local-move rounds vs an exact python simulator oracle."""

from hoover_spark.operators.communities import louvain_move, modularity
from hoover_spark.operators.graph import Graph
from hoover_spark.sources.synthetic import edges_to_pairs, rmat_graph, two_cliques


def _louvain_oracle(pairs, rounds):
    """Exact mirror: score(v→c) = 2m·w(v,c) − deg·(D_c − deg·[c=own]),
    argmax ties to smaller c, synchronous rounds."""
    sym = set()
    for s, d in pairs:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    adj = {}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    verts = set()
    for s, d in pairs:
        verts.add(s)
        verts.add(d)
    deg = {v: len(adj.get(v, ())) for v in verts}
    m = len(sym) // 2
    lab = {v: v for v in verts}
    for _ in range(rounds):
        dc = {}
        for v in verts:
            dc[lab[v]] = dc.get(lab[v], 0) + deg[v]
        new = {}
        for v in verts:
            w = {lab[v]: 0}
            for n in adj.get(v, ()):
                w[lab[n]] = w.get(lab[n], 0) + 1
            best = None
            for c, wc in w.items():
                score = 2 * m * wc - deg[v] * (dc[c] - (deg[v] if c == lab[v] else 0))
                key = (-score, c)
                if best is None or key < best:
                    best = key
            new[v] = best[1]
        lab = new
    return lab


def _got(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def test_louvain_round_exact_two_cliques(spark):
    g = two_cliques(spark, 5)
    pairs = edges_to_pairs(g)
    for rounds in (1, 2, 3):
        assert _got(louvain_move(g, n_rounds=rounds)) == _louvain_oracle(
            pairs, rounds
        ), f"rounds={rounds}"


def test_louvain_round_exact_rmat(spark):
    g = rmat_graph(spark, scale=6, edge_factor=4)
    pairs = edges_to_pairs(g)
    for rounds in (1, 2):
        assert _got(louvain_move(g, n_rounds=rounds)) == _louvain_oracle(
            pairs, rounds
        ), f"rounds={rounds}"


def test_louvain_cliques_collapse_and_improve_modularity(spark):
    """On two disjoint 5-cliques, a few move rounds must (a) give each
    clique a single community, (b) beat the singleton partition's
    modularity."""
    g = two_cliques(spark, 5)
    lab = louvain_move(g, n_rounds=3)
    got = _got(lab)
    cliq0 = {got[v] for v in range(5)}
    cliq1 = {got[v] for v in range(5, 10)}
    assert len(cliq0) == 1 and len(cliq1) == 1
    q_moved = modularity(g, lab).collect()[0]["modularity"]
    singleton = g.vertices().selectExpr("vid", "vid AS label")
    q_single = modularity(g, singleton).collect()[0]["modularity"]
    assert q_moved > q_single


def test_louvain_warm_labels_respected(spark):
    """Passing labels warm-starts the rounds (round-exact vs the oracle
    started from the same labels)."""
    g = two_cliques(spark, 4)
    pairs = edges_to_pairs(g)
    warm = {v: v % 2 for s, d in pairs for v in (s, d)}
    warm_df = spark.createDataFrame(
        sorted(warm.items()), schema="vid long, label long"
    )
    got = _got(louvain_move(g, n_rounds=1, labels=warm_df))
    # oracle with warm start
    verts = sorted(warm)
    sym = {(a, b) for s, d in pairs if s != d for a, b in ((s, d), (d, s))}
    adj = {}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    deg = {v: len(adj.get(v, ())) for v in verts}
    m = len(sym) // 2
    lab = dict(warm)
    dc = {}
    for v in verts:
        dc[lab[v]] = dc.get(lab[v], 0) + deg[v]
    want = {}
    for v in verts:
        w = {lab[v]: 0}
        for n in adj.get(v, ()):
            w[lab[n]] = w.get(lab[n], 0) + 1
        best = None
        for c, wc in w.items():
            score = 2 * m * wc - deg[v] * (dc[c] - (deg[v] if c == lab[v] else 0))
            if best is None or (-score, c) < best:
                best = (-score, c)
        want[v] = best[1]
    assert got == want
