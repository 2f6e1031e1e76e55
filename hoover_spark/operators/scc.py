"""Strongly connected components — the directed sibling of WCC and the
classic web-link-graph decomposition (the Broder et al. 2000 "bow-tie"
structure of the web is an SCC analysis).

Reference mapping: HOOVER's connected-components app exchanges hash-min
labels over the undirected edge view (``test/connected_components.c:
88-112``); SCC needs mutual reachability, so one hash-min pass is not
enough. We implement the **coloring algorithm** (Orzan 2004; the
FW-BW/coloring family of Slota, Rajamanickam & Madduri, IPDPS 2014 —
the standard scalable SCC method), expressed as two runs of the SAME
directed hash-min kernel per outer round:

1. **Forward coloring** — min-label propagation along directed edges
   to convergence: ``color(v)`` = min vid that reaches ``v``.
2. **Backward coloring, class-restricted** — the same kernel on the
   REVERSED edges filtered to same-color endpoints:
   ``rcolor(v)`` = min vid reachable from ``v`` without leaving the
   color class. ``v`` belongs to the SCC anchored at its class root
   exactly when ``rcolor(v) = color(v)`` (the root is its class's min
   vid, and every member→root path stays inside the class — classic
   FW-BW argument). Members leave the active set; unassigned color
   classes retry next round.

Both runs use **pointer jumping**: min-reachability is transitive
(``u →* v`` and ``w →* u`` imply ``w →* v``), so
``color(v) ← min(color(v), color(color(v)))`` is sound and monotone —
the same doubling that cuts WCC's rounds cuts the directed sweeps from
O(diameter) to O(log diameter)-ish. The jump lookup self-joins the
round's relaxed table; Catalyst reuses the underlying exchange
(ReusedExchange), so the relax subplan is shuffled once.

Spark-first plan: state is ``(vid, color)``; each inner round is one
Spark job (``hold_observed``) of three co-keyed shuffles — message
min, relax join, jump lookup — against the per-outer-round persisted
active-subgraph edge view (O(active edges), reused across all inner
rounds). At 10¹² edges the outer-round count is the graph's SCC-DAG
"peeling depth" from each round's root set — small on web graphs,
where one giant SCC dominates (Broder et al.); ``max_outer`` guards
pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hoover_spark.operators.graph import Graph
from hoover_spark.plans.iteration import IterationLoop, StopWatch


def _minlabel_directed(
    e: DataFrame,
    init: DataFrame,
    loop: IterationLoop,
    watch: StopWatch,
    it0: int,
    max_rounds: int = 200,
) -> tuple[DataFrame, int]:
    """Directed hash-min to convergence with pointer jumping.

    ``e`` is a persisted ``(src, dst)`` view; ``init`` is ``(vid,
    color)`` covering the vertex domain. Returns the converged
    ``(vid, color)`` (checkpointed) and the updated iteration counter.
    """
    color = loop.hold(init)
    it = it0
    for _ in range(max_rounds):
        it += 1
        msgs = (
            e.join(color.select(F.col("vid").alias("src"), "color"), on="src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("color").alias("mc"))
        )
        relaxed = color.join(msgs, on="vid", how="left").select(
            "vid",
            F.col("color").alias("prev"),
            F.least("color", F.coalesce("mc", "color")).alias("c1"),
        )
        jumped = relaxed.join(
            relaxed.select(F.col("vid").alias("c1"), F.col("c1").alias("cc")),
            on="c1",
            how="left",
        ).select(
            "vid", "prev", F.least("c1", F.coalesce("cc", "c1")).alias("color")
        )
        stepped = jumped.select(
            "vid",
            "color",
            (F.col("color") != F.col("prev")).cast("long").alias("chg"),
        )
        held, stats = loop.hold_observed(stepped, F.sum("chg").alias("changed"))
        changed = int(stats["changed"] or 0)
        loop.log(
            iteration=it,
            rows_shuffled=changed,
            delta_norm=float(changed),
            frontier_size=changed,
            wall_ms=watch.lap_ms(),
        )
        color = held.select("vid", "color")
        if changed == 0:
            return color, it
    raise RuntimeError("scc: directed min-label failed to converge")


def scc(
    graph: Graph,
    loop: IterationLoop | None = None,
    max_outer: int = 30,
) -> DataFrame:
    """Exact SCC labels over the directed edge list.

    Returns ``(vid: long, label: long)`` where ``label`` is the MIN
    vertex id of the vertex's strongly connected component (the same
    canonical-min convention as :func:`wcc`), covering every vertex of
    :meth:`Graph.vertices` (self-loop-only vertices are singleton
    SCCs — they have no cleaned edges, so ``color = rcolor = vid``).
    """
    spark = graph.edges.sparkSession
    loop = loop or IterationLoop(spark, kernel="scc", max_iterations=10_000)

    edges = graph.cleaned().select("src", "dst")
    active, stats = loop.hold_observed(
        graph.vertices(), F.count(F.lit(1)).alias("n_active")
    )
    n_active = int(stats["n_active"] or 0)
    result: DataFrame | None = None
    it = 0
    watch = StopWatch()

    for _outer in range(1, max_outer + 1):
        if n_active == 0:
            break
        e = loop.hold(
            edges.join(
                active.select(F.col("vid").alias("src")), on="src", how="left_semi"
            ).join(
                active.select(F.col("vid").alias("dst")), on="dst", how="left_semi"
            )
        )
        init = active.select("vid", F.col("vid").alias("color"))

        color, it = _minlabel_directed(e, init, loop, watch, it)

        # reversed, class-restricted edges: a path in er never leaves
        # its color class, so rcolor is within-class min reachability
        er = loop.hold(
            e.join(
                color.select(F.col("vid").alias("src"), F.col("color").alias("cs")),
                on="src",
            )
            .join(
                color.select(F.col("vid").alias("dst"), F.col("color").alias("cd")),
                on="dst",
            )
            .where(F.col("cs") == F.col("cd"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        rcolor, it = _minlabel_directed(er, init, loop, watch, it)

        member = (
            color.join(
                rcolor.select("vid", F.col("color").alias("rc")), on="vid"
            )
            .where(F.col("color") == F.col("rc"))
            .select("vid", F.col("color").alias("label"))
        )
        member = loop.hold(member)
        result = member if result is None else result.unionByName(member)
        result = loop.hold(result)
        active, stats = loop.hold_observed(
            active.join(member.select("vid"), on="vid", how="left_anti"),
            F.count(F.lit(1)).alias("n_active"),
        )
        n_active = int(stats["n_active"] or 0)

    if n_active > 0:
        raise RuntimeError(
            f"scc: {max_outer} outer rounds exhausted with {n_active} active "
            "vertices left (SCC-DAG peeling depth exceeds max_outer — raise it)"
        )
    if result is None:
        return graph.vertices().select(
            "vid", F.col("vid").alias("label")
        ).where(F.lit(False))
    return loop.finish(result.select("vid", "label"), it)
