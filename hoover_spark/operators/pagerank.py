"""PageRank: damped power iteration with dangling-mass redistribution.

The reference does not implement PageRank itself — it is the benchmark
it compares against on GraphX/Gelly/Giraph
(``bench/graphx/PageRankExample.scala:43-47``, tol 0.0001;
``bench/giraph/SimplePageRankComputation.java``). The north rule makes
it a first-class kernel here, converged to ``max |Δ| < tol`` (1e-6)
with per-vertex scores reproducible to allclose 1e-6 across
parallelism levels (float64 throughout; summation-order noise is far
below the tolerance).

Spark-first plan per iteration (all JVM-side, whole-stage codegen):

    contribs = edges ⋈ ranks⊕out_deg (on src)   — 1 shuffle join
    sums     = contribs groupBy(dst) SUM         — partial+final agg,
               optional explicit two-stage salted agg for hot dsts
    ranks'   = vertices ⟕ sums  →  (1-α)/n + α·(sum + dangling/n)
    delta    = max |ranks' - ranks|              — an Observation on the
               checkpoint action: ONE Spark job per iteration

Scale notes:
- ``edges`` is pre-partitioned by ``src`` once and persisted; every
  iteration's join reuses that partitioning (no re-shuffle of the big
  side — the reference's static PE ownership, SURVEY.md §1.2).
- the per-vertex (rank/out_deg) side is tiny relative to edges; AQE
  picks broadcast when it fits.
- dangling mass is one scalar aggregate per iteration (reference
  analogue: coupled-metric reduction, ``src/hoover.cpp:2819-3180``).
- hot destinations (a file imported by everything) are handled by the
  explicit salted two-stage SUM (north rule; SURVEY.md §4 O10) on top
  of Spark's map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hoover_spark.functions.skew import with_salt
from hoover_spark.operators.graph import Graph
from hoover_spark.plans.iteration import IterationLoop, StopWatch


def pagerank(
    graph: Graph,
    spark: SparkSession | None = None,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    n_iterations: int | None = None,
    salt_buckets: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    loop: IterationLoop | None = None,
    initial_ranks: DataFrame | None = None,
    n_vertices: int | None = None,
    initial_rank_sum: float | None = None,
    unroll: int = 1,
) -> DataFrame:
    """Return ``(vid: long, rank: double)``; ranks sum to 1.

    ``n_iterations`` pins an exact iteration count (bounded-iteration
    equivalence tests / SQL oracles); otherwise run to ``max|Δ| < tol``.
    ``salt_buckets > 0`` switches the contribution SUM to the explicit
    two-stage salted aggregation.
    ``initial_ranks`` warm-starts (streaming incremental re-convergence).
    ``n_vertices`` (with ``initial_ranks``) skips the vertex scan
    entirely — the streaming path tracks the count incrementally, so a
    micro-batch pays no O(|V|) distinct just to learn ``n``.
    ``initial_rank_sum`` renormalizes the warm ranks by dividing by the
    given sum INSIDE the initial state projection — the division fuses
    into the same job that materializes the state, so the caller never
    pays a separate O(|V|) sum + scaled-copy pass (r4 scale item). The
    value only shapes warm-start quality, never the fixed point: the
    damped iteration is an α-contraction whose converged vector is
    independent of the initial sum, so an incrementally-tracked
    approximation is fine.

    The final converged ``sum(rank)`` is published as
    ``loop.kernel_state["rank_sum"]`` (measured by the per-iteration
    Observation — no extra job); the streaming path feeds it back as
    the next batch's ``initial_rank_sum`` numerator.

    ``unroll > 1`` executes that many iterations per Spark job
    (Pregel-style checkpoint interval): the u steps chain lazily and
    ONE chunk-end localCheckpoint materializes them, so u-1 action
    round-trips and u-1 O(|V|) state materializations disappear per
    chunk. Two things make this sound:

    - the dangling mass for interior steps (a scalar the NEXT step's
      rank update needs, previously a Python float off the previous
      job's Observation) is computed IN-PLAN: dangling vertices emit
      their rank into the SAME contribution shuffle under a NULL dst
      (a group no real vid joins), and a 1-row aggregate over that
      reused exchange is broadcast back into the step — no second
      traversal of the state;
    - per-iteration lineage metrics (north rule) survive exactly: each
      step's rank and message count ride the chunk as carried columns
      (``_r{s}``/``_m{s}``) and the chunk-end Observation computes
      every step's delta / active frontier / rows shuffled in the same
      action (per-step wall is the chunk wall amortized).

    Interior-step state is re-derived (not materialized) by the two
    downstream consumers that need it (the message join and the rank
    update join) — an inherent diamond of the vertex-centric step.
    MEASURED VERDICT (r5, sf0.1 repo graph, local[32], 3 interleaved
    reps each): that recompute costs MORE than the saved barriers —
    unroll=2 median 18.9 s and unroll=3 median 25.3 s vs 16.0/17.3 s
    for unroll=1 (see BENCH.md) — so every headline/contract caller
    uses the default ``unroll=1``, whose plan and floats are exactly
    the classic one-job-per-iteration loop. The knob is kept (correct
    by construction: ranks within one float ULP, per-iteration metrics
    exact, tested in ``test_unroll_parity_and_metrics``) for regimes
    where the barrier term genuinely dominates the recompute term —
    e.g. a high-latency driver/scheduler or tiny warm re-convergence
    states — but it must be adopted by measurement, not assumption.
    In tol mode convergence is checked at chunk ends, so up to
    ``unroll - 1`` extra iterations may run past the crossing — they
    only tighten the answer.
    """
    spark = spark or graph.edges.sparkSession
    loop = loop or IterationLoop(
        spark,
        kernel="pagerank",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        max_iterations=n_iterations or max_iterations,
    )

    # Edge set as a LIST of views (usually one). A composite graph
    # (persisted base + micro-batch delta, DeltaGraph) yields two: the
    # per-iteration contribution join runs per view and unions the
    # outputs, so the base keeps its persisted hash-partitioning — a
    # union of the views themselves would erase it and re-shuffle the
    # FULL edge side every iteration of every micro-batch.
    edge_views = graph.clean_edge_views()
    verts = None
    if n_vertices is not None and initial_ranks is not None:
        n = int(n_vertices)
    else:
        verts = graph.vertices().persist()
        n = verts.count()
    if len(edge_views) == 1:
        out_deg = (
            edge_views[0]
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("out_deg"))
            .persist()
        )
    else:
        degs = None
        for v in edge_views:
            d = v.groupBy(F.col("src").alias("vid")).agg(
                F.count(F.lit(1)).alias("_od")
            )
            degs = d if degs is None else degs.unionByName(d)
        out_deg = (
            degs.groupBy("vid").agg(F.sum("_od").alias("out_deg")).persist()
        )

    start_iter = 0
    ranks = None
    if resume:
        loaded = loop.load_latest()
        if loaded is not None:
            ranks, start_iter = loaded
    if ranks is None:
        if initial_ranks is not None:
            ranks = initial_ranks.select("vid", "rank")
            if initial_rank_sum is not None and abs(initial_rank_sum - 1.0) > 1e-15:
                ranks = ranks.select(
                    "vid",
                    (F.col("rank") / F.lit(float(initial_rank_sum))).alias("rank"),
                )
        else:
            ranks = verts.select("vid", F.lit(1.0 / n).alias("rank"))

    # State carries the static out-degree (null = dangling): kills the
    # per-iteration degree join, and the end-of-iteration Observation
    # computes next iteration's dangling mass inside the checkpoint
    # action — ONE Spark job per iteration total (the reference's
    # coupled-metric reduction folded the same way,
    # src/hoover.cpp:2819-3180).
    state, init_stats = loop.hold_observed(
        ranks.join(out_deg, on="vid", how="left"),
        F.sum(
            F.when(F.col("out_deg").isNull(), F.col("rank")).otherwise(F.lit(0.0))
        ).alias("dangling"),
    )
    dangling = float(init_stats["dangling"] or 0.0)

    base = (1.0 - alpha) / n
    unroll = max(1, int(unroll))
    it = start_iter
    watch = StopWatch()
    while it < loop.max_iterations:
        steps = min(unroll, loop.max_iterations - it)

        # chunk of `steps` lazily-chained iterations; carried columns
        # _r0.._r{steps} (per-step ranks) and _m1.._m{steps} (per-step
        # message counts) feed the chunk-end Observation
        cur = state.select("vid", "out_deg", F.col("rank").alias("_r0"))
        for s in range(1, steps + 1):
            prev_rank = F.col(f"_r{s - 1}")
            wsrc = cur.where(F.col("out_deg").isNotNull()).select(
                F.col("vid").alias("src"),
                (prev_rank / F.col("out_deg")).alias("w"),
            )
            contribs = None
            for v in edge_views:
                c = v.join(wsrc, on="src").select("dst", "w")
                contribs = c if contribs is None else contribs.unionByName(c)

            if s == 1:
                # first step's dangling mass is a known scalar (the
                # previous chunk's Observation / the init aggregate)
                dang_per_n = F.lit(dangling / n)
            else:
                # interior steps: route the dangling ranks through the
                # SAME shuffle under a NULL dst — the null group never
                # equi-joins a vid, and the 1-row aggregate below reads
                # the already-built (reused) exchange, so the scalar
                # costs no second pass over the state
                dang_rows = cur.where(F.col("out_deg").isNull()).select(
                    F.lit(None).cast("long").alias("dst"),
                    prev_rank.alias("w"),
                )
                contribs = contribs.unionByName(dang_rows)

            if salt_buckets > 0:
                salted = with_salt(contribs, salt_buckets, cols=["w"])
                partial = salted.groupBy("dst", "salt").agg(
                    F.sum("w").alias("_w"), F.count(F.lit(1)).alias("_c")
                )
                sums = partial.groupBy("dst").agg(
                    F.sum("_w").alias("in_sum"), F.sum("_c").alias("msg_cnt")
                )
            else:
                sums = contribs.groupBy("dst").agg(
                    F.sum("w").alias("in_sum"), F.count(F.lit(1)).alias("msg_cnt")
                )

            joined = cur.join(
                sums.withColumnRenamed("dst", "vid"), on="vid", how="left"
            )
            if s > 1:
                dang_df = (
                    sums.where(F.col("dst").isNull())
                    .agg(F.coalesce(F.sum("in_sum"), F.lit(0.0)).alias("_D"))
                )
                joined = joined.crossJoin(F.broadcast(dang_df))
                dang_per_n = F.col("_D") / F.lit(float(n))

            keep = (
                ["vid", "out_deg"]
                + [f"_r{j}" for j in range(s)]
                + [f"_m{j}" for j in range(1, s)]
            )
            cur = joined.select(
                *keep,
                (
                    F.lit(base)
                    + F.lit(alpha)
                    * (F.coalesce("in_sum", F.lit(0.0)) + dang_per_n)
                ).alias(f"_r{s}"),
                F.coalesce("msg_cnt", F.lit(0)).alias(f"_m{s}"),
            )

        # materialize + stats in ONE action (Observation riding the
        # eager localCheckpoint): every step's convergence delta,
        # active set and messages shuffled, plus the NEXT chunk's
        # dangling mass — one Spark job per `steps` iterations.
        obs_exprs = []
        for s in range(1, steps + 1):
            d = F.abs(F.col(f"_r{s}") - F.col(f"_r{s - 1}"))
            obs_exprs += [
                F.max(d).alias(f"delta_{s}"),
                F.sum((d > tol).cast("long")).alias(f"active_{s}"),
                F.sum(f"_m{s}").alias(f"shuffled_{s}"),
            ]
        last = f"_r{steps}"
        obs_exprs += [
            F.sum(
                F.when(F.col("out_deg").isNull(), F.col(last)).otherwise(F.lit(0.0))
            ).alias("next_dangling"),
            F.sum(last).alias("rank_sum"),
        ]
        new_state, stats = loop.hold_observed(cur, *obs_exprs)

        chunk_wall = watch.lap_ms()
        delta = 0.0
        for s in range(1, steps + 1):
            it += 1
            delta = float(stats[f"delta_{s}"] or 0.0)
            loop.log(
                iteration=it,
                rows_shuffled=int(stats[f"shuffled_{s}"] or 0),
                delta_norm=delta,
                frontier_size=int(stats[f"active_{s}"] or 0),
                wall_ms=chunk_wall / steps,
            )
        dangling = float(stats["next_dangling"] or 0.0)
        loop.kernel_state["rank_sum"] = float(stats["rank_sum"] or 0.0)

        state = new_state.select("vid", "out_deg", F.col(last).alias("rank"))
        proj = state.select("vid", "rank")
        saved = loop.save_state(proj, it)
        if saved is not proj:
            # state was durably checkpointed; rebuild the carried degree
            state = saved.join(out_deg, on="vid", how="left")
        if n_iterations is None and delta < tol:
            break

    loop.kernel_state["n_vertices"] = n
    result = loop.finish(state.select("vid", "rank"), it)
    if verts is not None:
        verts.unpersist()
    out_deg.unpersist()
    return result
