"""SIR-style infection propagation on a time-unrolled layered graph.

Reference semantics (``test/infectious_test.c`` — the reference's only
officially benchmarked workload, BASELINE.md):

- actors random-walk toward a fixed destination with capped velocity
  and toroidal wrap (``compute_next_pos``, :132-167);
- the graph is **time-unrolled**: one vertex per (actor, timestep),
  each carrying its *previous* position ``PREV_P*`` (:239-240, 552-553;
  layer 0 has prev = start, :552);
- ``should_have_edge`` (:84-99) links vertices in *adjacent* time
  layers whose PREV positions are within ``infection_radius``, oriented
  DIRECTED_IN from the earlier layer;
- a vertex is infected iff its own actor was infected at t-1
  (``PREV_IS_INFECTED`` via the self-message, :182-197) OR any
  DIRECTED_IN neighbor (a layer t-1 vertex) is infected (:198-210).

So the recurrence, with pos(a,-1) := pos(a,0):

    infected(a, t) = infected(a, t-1)
                  OR ∃ b: infected(b, t-1)
                         AND dist(pos(b, t-2), pos(a, t-1)) ≤ r

(the edge predicate compares both endpoints' PREV positions — the
earlier layer's prev is one step further back; ported verbatim).

Spark-first: trajectories are closed-form column expressions unrolled
per timestep (every step of ``compute_next_pos`` is plain IEEE
arithmetic — bit-identical in any engine, so the DuckDB oracle
recomputes the whole simulation); propagation is one grid-pruned
radius join (:func:`hoover_spark.operators.spatial.radius_join`) + one
semi-join per layer, i.e. the engine's standard frontier-iteration
shape with a time column. Only infected layer t-1 vertices enter the
join — the frontier optimization the reference gets from
``needs_processing``.

Scale: per-layer work is one equi-join on grid cells over |actors|
rows; layers iterate sequentially exactly like WCC/PageRank rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hoover_spark.operators.spatial import radius_join

#: snap tolerance of compute_next_pos (test/infectious_test.c:135)
SNAP_EPS = 1e-9


def step_position(x, y, dx, dy):
    """One ``compute_next_pos`` step (:132-167) as column expressions
    over the unit torus: snap-to-destination when either coordinate is
    within 1e-9, velocity = direction capped at |v|/(5·dist), toroidal
    wrap. Returns (new_x, new_y)."""
    snap = (F.abs(x - dx) < F.lit(SNAP_EPS)) | (F.abs(y - dy) < F.lit(SNAP_EPS))
    px = F.when(snap, dx).otherwise(x)
    py = F.when(snap, dy).otherwise(y)
    vx = dx - px
    vy = dy - py
    mag = F.lit(5.0) * F.sqrt(vx * vx + vy * vy)
    # guard mag == 0 (at destination): stay put — the reference reaches
    # the same outcome through NaN-comparison fallthrough (:149-151)
    nvx = F.when(mag == 0.0, F.lit(0.0)).otherwise(vx / mag)
    nvy = F.when(mag == 0.0, F.lit(0.0)).otherwise(vy / mag)
    wx = F.when(F.abs(vx) > F.abs(nvx), nvx).otherwise(vx)
    wy = F.when(F.abs(vy) > F.abs(nvy), nvy).otherwise(vy)
    nx, ny = px + wx, py + wy
    nx = F.when(nx >= 1.0, nx - 1.0).when(nx < 0.0, nx + 1.0).otherwise(nx)
    ny = F.when(ny >= 1.0, ny - 1.0).when(ny < 0.0, ny + 1.0).otherwise(ny)
    return nx, ny


def sir_layers(actors: DataFrame, n_steps: int) -> DataFrame:
    """(actor_id, t, ppx, ppy, infected0) — the time-unrolled vertex
    table. ``actors(actor_id, x0, y0, dst_x, dst_y, infected0)``;
    ``ppx/ppy`` is the layer's PREV position (pos at t-1; layer 0
    carries its start position, matching :552-553).

    Each step is materialized (localCheckpoint) before the next: one
    step of ``compute_next_pos`` references its input ~10 times, so a
    purely symbolic unroll grows the expression tree ~10^t and stalls
    the optimizer — the time dimension iterates over *data*, not over
    plan depth (exactly like WCC rounds)."""
    cur = actors.select(
        "actor_id", "dst_x", "dst_y", "infected0",
        F.col("x0").alias("x"), F.col("y0").alias("y"),
        F.col("x0").alias("ppx"), F.col("y0").alias("ppy"),
    ).localCheckpoint()
    out = None
    for t in range(n_steps):
        layer = cur.select(
            "actor_id", F.lit(t).alias("t"), "ppx", "ppy", "infected0"
        )
        out = layer if out is None else out.unionByName(layer)
        if t < n_steps - 1:
            nx, ny = step_position(
                F.col("x"), F.col("y"), F.col("dst_x"), F.col("dst_y")
            )
            cur = cur.select(
                "actor_id", "dst_x", "dst_y", "infected0",
                nx.alias("x"), ny.alias("y"),
                F.col("x").alias("ppx"), F.col("y").alias("ppy"),
            ).localCheckpoint()
    return out


def sir_propagate(
    layers: DataFrame,
    radius: float,
    n_steps: int,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(actor_id, t, infected) — full infection trace over the layered
    graph. Per layer: grid-pruned radius join of the *infected subset*
    of layer t-1 (frontier) against layer t, then OR with the actor's
    own previous state."""
    layers = layers.localCheckpoint()
    prev = (
        layers.where(F.col("t") == 0)
        .select("actor_id", "ppx", "ppy", F.col("infected0").alias("infected"))
        .localCheckpoint()
    )
    results = [prev.select("actor_id", F.lit(0).alias("t"), "infected")]
    for t in range(1, n_steps):
        cur = layers.where(F.col("t") == t).select("actor_id", "ppx", "ppy")
        carriers = prev.where(F.col("infected")).select("ppx", "ppy")
        touched = radius_join(
            cur, carriers, ["ppx", "ppy"], radius,
            left_cols=["actor_id"], right_cols=[],
        ).distinct()
        cur_inf = (
            cur.join(
                prev.select("actor_id", F.col("infected").alias("was")),
                on="actor_id",
            )
            .join(
                touched.select("actor_id", F.lit(True).alias("hit")),
                on="actor_id", how="left",
            )
            .select(
                "actor_id", "ppx", "ppy",
                (F.col("was") | F.coalesce("hit", F.lit(False))).alias("infected"),
            )
            .localCheckpoint()
        )
        results.append(cur_inf.select("actor_id", F.lit(t).alias("t"), "infected"))
        prev = cur_inf
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def sir_summary(trace: DataFrame) -> DataFrame:
    """(t, n_infected) — the coupled metric the reference reduces each
    iteration (:352-368: global infected-count sum)."""
    return (
        trace.groupBy("t")
        .agg(F.sum(F.col("infected").cast("long")).alias("n_infected"))
    )
