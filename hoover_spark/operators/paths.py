"""Multi-source BFS hop distances and neighborhood link prediction.

Reference mapping: HOOVER's traversal primitive is the per-iteration
neighbor gather (``hvr_get_neighbors``, ``src/hoover.cpp:603-622``)
that every app builds walks on top of; multi-source BFS is the hop-
bounded specialization of the same hash-min exchange the connected-
components app runs (``test/connected_components.c:88-112``) with
distance instead of label, and link prediction is the reference's
2-hop wedge machinery (``test/count_triangles.c:64-88``) re-aggregated
per *open* wedge instead of per closed triangle.

Spark-first plans:

- **BFS**: frontier-delta expansion. State ``(vid, hops)`` only ever
  grows; each round joins the *frontier only* (not the full state)
  against the symmetric edge table, anti-joins the visited set, and
  unions the survivors in. The big edge side keeps the Graph's hash
  partitioning across all rounds; the frontier is the small shrinking
  side (AQE broadcasts it when it fits). One Spark job per round via
  the ``hold_observed`` idiom. At 100 TB the cost is
  O(Σ_round |frontier-adjacent edges|) — the same work a Pregel BFS
  does, with no per-round full-state shuffle.
- **Link prediction**: one self-join of the symmetric edge table on
  the wedge center (src=src, dst<dst), an aggregation keyed on the
  open pair, and an anti-join against the canonical edge set. Skew:
  a degree-d hub emits d(d-1)/2 wedge rows, so ``max_center_degree``
  caps hub centers (same default-on guard shape as gbad's); for link
  prediction dropping super-hub centers is standard practice — a
  celebrity neighbor carries ~no signal, which is exactly why the
  Resource-Allocation weight 1/deg(v) → 0 there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hoover_spark.operators.graph import Graph
from hoover_spark.plans.iteration import IterationLoop, StopWatch


def bfs_hops(
    graph: Graph,
    seeds: DataFrame,
    max_hops: int,
    loop: IterationLoop | None = None,
) -> DataFrame:
    """Hop distance from a seed set over the undirected graph.

    Returns ``(vid: long, hops: long)`` for every vertex reachable
    within ``max_hops`` of any seed (seeds themselves at hops 0).
    ``seeds`` needs a ``vid`` column; ids not present in the graph are
    still reported at hops 0 (they are valid query points whose
    neighborhoods are empty).
    """
    spark = graph.edges.sparkSession
    loop = loop or IterationLoop(spark, kernel="bfs", max_iterations=max_hops)

    sym = graph.sym_edges().select("src", "dst")
    dist = loop.hold(
        seeds.select(F.col("vid").cast("long").alias("vid"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )
    frontier = dist

    watch = StopWatch()
    rounds = 0
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.select(F.col("vid").alias("src")), on="src")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(dist.select("vid"), on="vid", how="left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        )
        nxt, stats = loop.hold_observed(nxt, F.count(F.lit(1)).alias("n_new"))
        n_new = int(stats["n_new"] or 0)
        loop.log(
            iteration=h,
            rows_shuffled=n_new,
            delta_norm=float(n_new),
            frontier_size=n_new,
            wall_ms=watch.lap_ms(),
        )
        rounds = h
        if n_new == 0:
            break
        dist = loop.hold(dist.unionByName(nxt))
        frontier = nxt

    return loop.finish(dist.select("vid", "hops"), rounds)


def link_predict(
    graph: Graph,
    min_common: int = 1,
    max_center_degree: int | None = None,
    scores: tuple[str, ...] = ("ra",),
) -> DataFrame:
    """Open-wedge link prediction over the undirected graph.

    For every non-adjacent pair ``(u, w)`` with at least ``min_common``
    common neighbors, returns ``(u, w, common_neighbors)`` plus the
    requested score columns:

    - ``ra`` — Resource Allocation index, Σ_v 1/deg(v) (Zhou, Lü &
      Zhang 2009). Pure IEEE division + sum: bit-reproducible against a
      SQL oracle after rounding, which is why the contract query uses
      it.
    - ``aa`` — Adamic–Adar, Σ_v 1/ln(deg(v)) (libm ``log`` may differ
      by 1 ulp across engines; fine for use, held out of the exact
      oracle gate).

    Output pairs are canonical (``u < w``). ``max_center_degree``
    drops wedge centers above the cap *before* the self-join — the
    skew guard for hub vertices (a degree-d center emits d(d−1)/2
    rows); capped centers also carry the least signal (their RA/AA
    weight ≈ 0).
    """
    sym = graph.sym_edges().select("src", "dst")
    deg = graph.degrees()  # (vid, degree) over the symmetric view
    if max_center_degree is not None:
        deg = deg.where(F.col("degree") <= max_center_degree)

    score_cols = {
        "ra": (F.lit(1.0) / F.col("degree").cast("double")).alias("w_ra"),
        # degree-1 centers can't form a wedge, but ANSI mode still
        # evaluates the projection: guard ln(1)=0 out of the divisor
        "aa": F.when(
            F.col("degree") >= 2,
            F.lit(1.0) / F.log(F.col("degree").cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("w_aa"),
    }
    unknown = set(scores) - set(score_cols)
    if unknown:
        raise ValueError(f"unknown link-predict scores: {sorted(unknown)}")
    centers = deg.select(
        F.col("vid").alias("v"), *[score_cols[s] for s in scores]
    )

    a = sym.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    b = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = (
        a.join(b, on="v")
        .where(F.col("u") < F.col("w"))
        # join on the (small, per-vertex) centers side AFTER the wedge
        # filter: a capped center drops all its wedges here
        .join(centers, on="v")
    )
    aggs = [F.count(F.lit(1)).alias("common_neighbors")] + [
        F.sum(f"w_{s}").alias(f"{s}_score") for s in scores
    ]
    pairs = wedges.groupBy("u", "w").agg(*aggs)
    if min_common > 1:
        pairs = pairs.where(F.col("common_neighbors") >= min_common)

    canon = graph.canonical().select(
        F.col("src").alias("u"), F.col("dst").alias("w")
    )
    return pairs.join(canon, on=["u", "w"], how="left_anti").select(
        "u",
        "w",
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        *[f"{s}_score" for s in scores],
    )
