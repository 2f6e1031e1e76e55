"""WCC correctness vs union-find oracle (exact, per north rule)."""

import pytest

from hoover_spark.operators.wcc import wcc
from hoover_spark.sources.synthetic import (
    cycle_graph,
    edges_to_pairs,
    path_graph,
    rmat_graph,
    star_graph,
    two_cliques,
)
from tests.oracles import union_find_components


def labels_of(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def assert_matches_oracle(g):
    pairs = edges_to_pairs(g)
    got = labels_of(wcc(g))
    want = union_find_components(pairs)
    assert got == want


def test_path(spark):
    assert_matches_oracle(path_graph(spark, 33))


def test_cycle(spark):
    assert_matches_oracle(cycle_graph(spark, 17))


def test_star(spark):
    assert_matches_oracle(star_graph(spark, 50))


def test_two_cliques_disjoint(spark):
    g = two_cliques(spark, 4, bridge=False)
    got = labels_of(wcc(g))
    assert set(got.values()) == {0, 4}
    assert_matches_oracle(g)


def test_two_cliques_bridged(spark):
    g = two_cliques(spark, 4, bridge=True)
    got = labels_of(wcc(g))
    assert set(got.values()) == {0}


def test_rmat(spark):
    assert_matches_oracle(rmat_graph(spark, scale=8, edge_factor=4))


def test_long_path_converges_fast(spark):
    """Pointer jumping: a 200-vertex path must converge in far fewer
    than 200 iterations (O(log) rounds)."""
    from hoover_spark.plans.iteration import IterationLoop

    g = path_graph(spark, 200)
    loop = IterationLoop(spark, kernel="wcc", max_iterations=50)
    got = labels_of(wcc(g, loop=loop))
    assert got == union_find_components(edges_to_pairs(g))
    assert len(loop.metrics) < 25


def test_no_pointer_jumping_matches(spark):
    g = two_cliques(spark, 4, bridge=True)
    got = labels_of(wcc(g, pointer_jumping=False))
    assert got == union_find_components(edges_to_pairs(g))


def test_checkpoint_resume(spark, tmp_path):
    """Run to iter K with checkpointing, then resume from disk and
    converge — final labels identical to a straight run."""
    g = rmat_graph(spark, scale=7, edge_factor=4)
    d = str(tmp_path / "ck")
    from hoover_spark.plans.iteration import IterationLoop

    # Straight run.
    want = labels_of(wcc(g))

    # Interrupted run: max_iterations=2, checkpoint every 1.
    loop = IterationLoop(spark, "wcc", checkpoint_dir=d, checkpoint_every=1, max_iterations=2)
    wcc(g, loop=loop)
    # Resume.
    loop2 = IterationLoop(spark, "wcc", checkpoint_dir=d, checkpoint_every=1, max_iterations=100)
    got = labels_of(wcc(g, loop=loop2, resume=True))
    assert got == want


def test_metrics_emitted(spark, tmp_path):
    import json
    import os

    g = two_cliques(spark, 4)
    d = str(tmp_path / "ck")
    from hoover_spark.plans.iteration import IterationLoop

    loop = IterationLoop(spark, "wcc", checkpoint_dir=d, checkpoint_every=1)
    wcc(g, loop=loop)
    path = os.path.join(d, "wcc", "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    assert rows, "metrics written"
    for r in rows:
        assert {"kernel", "iter", "rows_shuffled", "delta_norm", "frontier_size", "wall_ms", "npartitions"} <= set(r)
    assert rows[-1]["frontier_size"] == 0  # converged


def test_self_loop_only_vertex_survives_caching(spark):
    """A vertex whose only incidence is a self-loop must appear in
    vertices()/wcc() regardless of which derived edge view a kernel
    cached first (vertices always derives from the raw edge list)."""
    from hoover_spark.operators.graph import graph_from_pairs

    pairs = [(0, 1), (1, 2), (7, 7)]  # 7 has only a self-loop

    g1 = graph_from_pairs(spark, pairs)
    g1.sym_edges()  # cache the cleaned symmetric view FIRST
    assert {r["vid"] for r in g1.vertices().collect()} == {0, 1, 2, 7}
    assert labels_of(wcc(g1)) == {0: 0, 1: 0, 2: 0, 7: 7}

    g2 = graph_from_pairs(spark, pairs)  # no caching
    assert {r["vid"] for r in g2.vertices().collect()} == {0, 1, 2, 7}
    assert labels_of(wcc(g2)) == {0: 0, 1: 0, 2: 0, 7: 7}


def test_adaptive_pointer_jumping_matches_pinned_modes(spark):
    """'auto' must produce identical labels to both pinned modes, on a
    long chain (jump pays to the end) and on a clique-ish graph (jump
    gain hits zero early and the self-join is dropped)."""
    from hoover_spark.sources.synthetic import path_graph, two_cliques

    for g_fn in (lambda: path_graph(spark, 65), lambda: two_cliques(spark, k=5, bridge=True)):
        want = labels_of(wcc(g_fn(), pointer_jumping=True))
        assert labels_of(wcc(g_fn(), pointer_jumping="auto")) == want
        assert labels_of(wcc(g_fn(), pointer_jumping=False)) == want


def test_pointer_jumping_rejects_truthy_nonbool(spark):
    """1 / numpy truthy values must raise, not silently disable the
    adaptive jump (ADVICE r2)."""
    g = path_graph(spark, 8)
    with pytest.raises(ValueError, match="pointer_jumping"):
        wcc(g, pointer_jumping=1)


def test_pre_contract_seeding_matches_plain(spark):
    """Seeding hash-min from the per-partition union-find star forest
    must converge to the identical labels (and in no more rounds)."""
    from hoover_spark.plans.iteration import IterationLoop

    for g in (path_graph(spark, 64), rmat_graph(spark, scale=8, edge_factor=4)):
        plain_loop = IterationLoop(g.edges.sparkSession, kernel="wcc")
        seeded_loop = IterationLoop(g.edges.sparkSession, kernel="wcc")
        plain = labels_of(wcc(g, loop=plain_loop))
        seeded = labels_of(wcc(g, loop=seeded_loop, pre_contract=True))
        assert seeded == plain
        assert len(seeded_loop.metrics) <= len(plain_loop.metrics)


def test_pre_contract_with_frontier_is_sound(spark):
    """r3 ADVICE: contraction-lowered seeds OUTSIDE the caller's
    frontier must still be broadcast. A chain whose frontier is only
    the min vertex would previously converge with stale labels on the
    cross-partition tail; the lowered-seed frontier expansion fixes
    it."""
    from hoover_spark.operators.graph import graph_from_pairs

    # 24-vertex chain split over 8 partitions: contraction is certain
    # to lower seeds in partitions the 1-vertex frontier never touches
    pairs = [(i, i + 1) for i in range(24)]
    g = graph_from_pairs(spark, pairs, num_partitions=8)
    frontier = spark.createDataFrame([(0,)], "vid long")
    got = labels_of(wcc(g, pre_contract=True, initial_frontier=frontier))
    assert got == {v: 0 for v in range(25)}


def test_pre_contract_warm_start_cuts_rounds(spark):
    """VERDICT r3 #6: a warm restart after a chain-heavy batch benefits
    from label-aware local contraction — identical labels, fewer
    message rounds (the new chain collapses in the zero-shuffle sweep
    instead of O(log chain) hash-min rounds)."""
    from pyspark.sql import functions as F

    from hoover_spark.operators.graph import graph_from_pairs
    from hoover_spark.plans.iteration import IterationLoop

    # converged old graph: component {0, 1}
    old_pairs = [(0, 1)]
    # incremental batch: a 256-vertex chain hanging off vertex 0
    chain = [(0, 1000)] + [(1000 + i, 1001 + i) for i in range(255)]
    g = graph_from_pairs(spark, old_pairs + chain, num_partitions=8)
    prev = spark.createDataFrame([(0, 0), (1, 0)], "vid long, label long")
    new_verts = spark.createDataFrame(
        [(v, v) for v in range(1000, 1256)], "vid long, label long"
    )
    warm = prev.unionByName(new_verts)
    endpoints = sorted({v for e in chain for v in e})
    frontier = spark.createDataFrame([(v,) for v in endpoints], "vid long")

    plain_loop = IterationLoop(spark, kernel="wcc")
    seeded_loop = IterationLoop(spark, kernel="wcc")
    plain = labels_of(
        wcc(g, loop=plain_loop, initial_labels=warm, initial_frontier=frontier)
    )
    seeded = labels_of(
        wcc(
            g,
            loop=seeded_loop,
            initial_labels=warm,
            initial_frontier=frontier,
            pre_contract=True,
        )
    )
    want = {v: 0 for v in [0, 1] + list(range(1000, 1256))}
    assert plain == want
    assert seeded == want
    assert len(seeded_loop.metrics) < len(plain_loop.metrics)


def test_multi_level_pre_contract_matches_and_cuts_rounds(spark):
    """pre_contract_levels > 1 contracts the star forest again (iterated
    star contraction, Kiveris et al. SoCC'14): identical labels always;
    strictly fewer hash-min rounds on hub-heavy graphs, where a
    high-degree vertex split across k partitions carries k roots that
    one level-2 task merges at once. (On hub-free chains over random
    hash partitions the levels add little — each level then only merges
    the rare adjacent fragments — so the round-count claim is asserted
    on a power-law graph, the exactness claim on both.)"""
    from hoover_spark.plans.iteration import IterationLoop

    rg = rmat_graph(spark, scale=10, edge_factor=4)
    want = union_find_components(edges_to_pairs(rg))
    rounds = {}
    for lv in (1, 3):
        loop = IterationLoop(spark, kernel="wcc")
        got = labels_of(
            wcc(rg, loop=loop, pre_contract=True, pre_contract_levels=lv,
                pointer_jumping=False)
        )
        assert got == want
        rounds[lv] = len(loop.metrics)
    assert rounds[3] < rounds[1]

    # long cross-partition chain: levels must stay oracle-exact even
    # where they cannot help (adaptive jumping handles convergence)
    g = path_graph(spark, 257)
    got = labels_of(wcc(g, pre_contract=True, pre_contract_levels=3))
    assert got == {v: 0 for v in range(257)}


def test_unroll_matches_classic_loop(spark):
    """unroll=3 (three hash-min rounds per Spark job: in-plan interior
    frontiers, chunk-start jump lookup, per-round metrics off one
    chunk-end Observation) must converge to the exact same labels as
    the one-job-per-round loop in every jump mode, including with the
    multi-level contraction seed."""
    from hoover_spark.plans.iteration import IterationLoop

    g = rmat_graph(spark, scale=7, edge_factor=3)
    want = labels_of(wcc(g, pointer_jumping=False))
    for jump in (True, False, "auto"):
        got = labels_of(wcc(g, pointer_jumping=jump, unroll=3))
        assert got == want, f"jump={jump}"
    lc = IterationLoop(spark, "wcc", max_iterations=100)
    got = labels_of(
        wcc(g, pointer_jumping=True, pre_contract=True,
            pre_contract_levels=2, unroll=3, loop=lc)
    )
    assert got == want
    # per-round lineage metrics still one entry per ROUND (north rule),
    # not per chunk
    assert len(lc.metrics) >= 1
    assert all(m["kernel"] == "wcc" for m in lc.metrics)
    # monotone frontier tail: the final logged round is the fixpoint
    assert lc.metrics[-1]["frontier_size"] == 0
