"""Label propagation — two flavors.

1. **min-LP** — the reference's actual community kernel: min-label
   exchange over the (super)graph (``test/community_detection.cpp:493-512``
   reuses the same hash-min kernel as connected components). We expose
   it as bounded-iteration hash-min (no pointer jumping, so iteration N
   matches the reference's synchronous trace at iteration N exactly).

2. **mode-LP** — classic synchronous label propagation (each vertex
   adopts the most frequent neighbor label) with a *deterministic
   tie-break* (smallest label among the most frequent) so results are
   identical at any parallelism (SURVEY.md §7.4 determinism note).

Both are pure join+agg programs; the mode step's
``groupBy(vid, label).count`` then per-vid argmax is expressed with
``max_by``-style struct max — one shuffle, no window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hoover_spark.operators.graph import Graph
from hoover_spark.operators.wcc import wcc
from hoover_spark.plans.iteration import IterationLoop, StopWatch


def min_label_propagation(
    graph: Graph,
    n_iterations: int,
    loop: IterationLoop | None = None,
) -> DataFrame:
    """Exactly ``n_iterations`` synchronous min-label rounds — the
    reference's per-iteration semantics (no shortcutting)."""
    spark = graph.edges.sparkSession
    loop = loop or IterationLoop(spark, kernel="min_lp", max_iterations=n_iterations)
    loop.max_iterations = n_iterations
    return wcc(graph, spark=spark, pointer_jumping=False, loop=loop)


def mode_label_propagation(
    graph: Graph,
    n_iterations: int = 10,
    loop: IterationLoop | None = None,
) -> DataFrame:
    """Synchronous mode-LP with min-label tie-break. Returns (vid, label)."""
    spark = graph.edges.sparkSession
    loop = loop or IterationLoop(spark, kernel="mode_lp", max_iterations=n_iterations)

    edges = graph.sym_edges()
    labels = loop.hold(
        graph.vertices().select(F.col("vid"), F.col("vid").alias("label"))
    )

    watch = StopWatch()
    for it in range(1, n_iterations + 1):
        msgs = edges.join(
            labels.select(F.col("vid").alias("src"), "label"), on="src"
        ).select(F.col("dst").alias("vid"), "label")
        counts = msgs.groupBy("vid", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # argmax by (cnt desc, label asc): max of struct(cnt, -label).
        best = counts.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"),
            F.sum("cnt").alias("msg_cnt"),
        ).select(
            "vid", (-F.col("m.neg")).alias("mode_label"), "msg_cnt"
        )
        stepped = labels.join(best, on="vid", how="left").select(
            "vid",
            F.col("label").alias("prev_label"),
            F.coalesce("mode_label", "label").alias("label"),
            F.coalesce("msg_cnt", F.lit(0)).alias("msg_cnt"),
        )
        # materialize + stats in one action (Observation on the eager
        # localCheckpoint) — no separate per-iteration stats job
        new_labels, stats = loop.hold_observed(
            stepped,
            F.sum((F.col("label") != F.col("prev_label")).cast("long")).alias("changed"),
            F.sum("msg_cnt").alias("shuffled"),
        )
        loop.log(
            iteration=it,
            rows_shuffled=int(stats["shuffled"] or 0),
            delta_norm=float(stats["changed"] or 0),
            frontier_size=int(stats["changed"] or 0),
            wall_ms=watch.lap_ms(),
        )
        labels = new_labels.select("vid", "label")
        labels = loop.save_state(labels, it)
        if int(stats["changed"] or 0) == 0:
            break

    return loop.finish(labels.select("vid", "label"), n_iterations)
