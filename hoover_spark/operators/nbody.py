"""Time-unrolled 2-D n-body with velocity state (nbody port).

Reference: ``test/simple_nbody_test.c`` — particles live on a
100x100 domain; the graph is time-unrolled (one vertex per particle
per timestep) exactly like the infectious model, but each vertex also
carries a *velocity* that integrates the neighbor forces:

- ``should_have_edge`` (:52-72) links vertices in adjacent time layers
  whose PREV positions are within ``distance_threshold`` (plain
  Euclidean, no wrap);
- ``compute_accel`` (:91-129): force from each layer-(t-1) neighbor j≠i
  is ``(1/Δx, 1/Δy)`` toward/away per component using the neighbor's
  *updated* position, summed, then norm-capped at ``MAX_ACCEL``;
- ``update_metadata`` (:131-211): ``v += a``; ``pos += v`` with
  toroidal wrap (:175-180); the self-message carries pos/vel to the
  next layer (:141-156), so a layer-t vertex's PREV position is
  pos(t-1) while its *neighbors'* PREV positions are pos(t-2).

Recurrence, with ``pos(-1) := pos(0)`` (layer 0 is created with
PREV = start, :337-347):

    N(i,t) = { j≠i : |pos_i(t-1) - pos_j(t-2)| < threshold }
    a(i,t) = cap( Σ_{j∈N} 1/(pos_j(t-1) - pos_i(t-1)) )   per component
    v(i,t) = v(i,t-1) + a(i,t);  pos(i,t) = wrap(pos(i,t-1) + v(i,t))

Spark-first: per timestep one grid-pruned neighbor join (left side
keyed on pos(t-1), right side exploded over the 3x3 neighbor cells of
its PREV pos(t-2) — ``might_interact``, :214-277 is exactly this cell
expansion) + one aggregation; the scalar math is shared SQL strings so
the DuckDB oracle executes bit-identical IEEE sequences.

Determinism notes:

1. force sums are order-sensitive in floating point, so both engines
   fold the per-neighbor forces **in ascending neighbor-id order**
   (Spark: ``aggregate(array_sort(collect_list(...)))`` — a sequential
   left fold; DuckDB: ``list_aggregate(list(f ORDER BY nid), 'sum')``,
   verified left-to-right);
2. the reference caps via ``MAX_ACCEL*cos(atan(ay/ax))`` (:115-125);
   we use the algebraic identity ``MAX_ACCEL*(a/norm)`` — equal up to
   libm rounding (atan/cos are not correctly rounded; sqrt is, so the
   substitution is the cross-engine-exact form);
3. the wrap is a single conditional, not the reference's ``while``:
   |v| ≤ MAX_ACCEL·t ≪ domain, so one wrap always suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOMAIN = 100.0           # simple_nbody_test.c:30
MAX_ACCEL = 0.001        # :12
THRESHOLD = 10.0         # :28


def accel_cap_exprs() -> list[tuple[str, str]]:
    """Norm-cap + integrate, shared between engines (cols: ax, ay, vx,
    vy, x, y → vx2, vy2, x2, y2)."""
    return [
        ("norm", "sqrt(ax * ax + ay * ay)"),
        ("cax", "CASE WHEN norm > 0.001E0 THEN 0.001E0 * (ax / norm) ELSE ax END"),
        ("cay", "CASE WHEN norm > 0.001E0 THEN 0.001E0 * (ay / norm) ELSE ay END"),
        ("vx2", "vx + cax"),
        ("vy2", "vy + cay"),
        ("x2", "CASE WHEN x + vx2 >= 100.0E0 THEN x + vx2 - 100.0E0 "
               "WHEN x + vx2 < 0.0E0 THEN x + vx2 + 100.0E0 ELSE x + vx2 END"),
        ("y2", "CASE WHEN y + vy2 >= 100.0E0 THEN y + vy2 - 100.0E0 "
               "WHEN y + vy2 < 0.0E0 THEN y + vy2 + 100.0E0 ELSE y + vy2 END"),
    ]


def _apply_exprs(df: DataFrame, exprs: list[tuple[str, str]]) -> DataFrame:
    for name, sql in exprs:
        df = df.select("*", F.expr(sql).alias(name))
    return df


def _guarded_inv(n: F.Column, p: F.Column, axis: str) -> F.Column:
    """``1/(n - p)`` with the reference's ``assert(x_delta != 0.0)``
    (``compute_accel``, :103/:110) made loud on both engines: two
    interacting particles sharing an exact coordinate raise instead of
    silently folding a NULL-turned-zero force into the sum (Spark,
    non-ANSI, yields NULL on 1/0 while DuckDB yields inf — a silent
    cross-engine divergence without the guard)."""
    return F.when(
        n == p,
        F.raise_error(
            F.lit(
                f"nbody: interacting particles share an exact {axis} "
                "coordinate (reference asserts x_delta != 0.0)"
            )
        ).cast("double"),
    ).otherwise(F.lit(1.0) / (n - p))


def nbody_step(state: DataFrame, threshold: float = THRESHOLD) -> DataFrame:
    """One timestep as a (lazy) DataFrame plan over state
    ``(pid, x, y, vx, vy, ppx, ppy)`` — the grid-pruned layer join +
    order-deterministic force fold + cap/integrate/wrap. Shared by
    :func:`nbody_simulate` and the plan auditor
    (``tools/explain_plans.py``)."""
    cell = threshold  # grid side = interaction radius (might_interact)
    thr2 = float(threshold) * float(threshold)
    # neighbor join: my pos(t-1) vs their PREV pos(t-2), pruned via
    # grid cells (home cell on the left, 3x3 expansion on the right)
    left = state.select(
        "pid", "x", "y", "vx", "vy",
        F.floor(F.col("x") / F.lit(cell)).alias("gx"),
        F.floor(F.col("y") / F.lit(cell)).alias("gy"),
    )
    right = state.select(
        F.col("pid").alias("nid"),
        F.col("x").alias("nx"), F.col("y").alias("ny"),
        F.col("ppx").alias("nppx"), F.col("ppy").alias("nppy"),
    ).select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    (F.floor(F.col("nppx") / F.lit(cell)) + dx).alias("gx"),
                    (F.floor(F.col("nppy") / F.lit(cell)) + dy).alias("gy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ])
        ).alias("g"),
    ).select("nid", "nx", "ny", "nppx", "nppy", "g.gx", "g.gy")
    # distance test spelled with explicit multiplies — pow() is not
    # an exact fp op; strict < per the reference predicate
    pairs = (
        left.join(right, on=["gx", "gy"])
        .where(F.col("pid") != F.col("nid"))
        .where(
            (F.col("x") - F.col("nppx")) * (F.col("x") - F.col("nppx"))
            + (F.col("y") - F.col("nppy")) * (F.col("y") - F.col("nppy"))
            < F.lit(thr2)
        )
        .select(
            "pid",
            F.struct(
                "nid",
                _guarded_inv(F.col("nx"), F.col("x"), "x").alias("fx"),
                _guarded_inv(F.col("ny"), F.col("y"), "y").alias("fy"),
            ).alias("f"),
        )
    )
    sums = pairs.groupBy("pid").agg(
        F.array_sort(F.collect_list("f")).alias("fs")
    ).select(
        "pid",
        F.aggregate("fs", F.lit(0.0), lambda acc, s: acc + s["fx"]).alias("ax"),
        F.aggregate("fs", F.lit(0.0), lambda acc, s: acc + s["fy"]).alias("ay"),
    )
    stepped = state.join(sums, on="pid", how="left").select(
        "pid", "x", "y", "vx", "vy",
        F.coalesce("ax", F.lit(0.0)).alias("ax"),
        F.coalesce("ay", F.lit(0.0)).alias("ay"),
    )
    return _apply_exprs(stepped, accel_cap_exprs()).select(
        "pid",
        F.col("x2").alias("x"), F.col("y2").alias("y"),
        F.col("vx2").alias("vx"), F.col("vy2").alias("vy"),
        F.col("x").alias("ppx"), F.col("y").alias("ppy"),
    )


def nbody_simulate(
    particles0: DataFrame,
    n_steps: int,
    threshold: float = THRESHOLD,
    spark: SparkSession | None = None,
) -> DataFrame:
    """(pid, t, x, y, vx, vy) trace over t = 0..n_steps-1.

    ``particles0(pid, x, y)`` — start positions in [0, DOMAIN); start
    velocity 0 (reference :341-349)."""
    state = particles0.select(
        "pid",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.lit(0.0).alias("vx"),
        F.lit(0.0).alias("vy"),
        F.col("x").cast("double").alias("ppx"),  # pos(-1) := pos(0)
        F.col("y").cast("double").alias("ppy"),
    ).localCheckpoint()

    traces = [state.select("pid", F.lit(0).alias("t"), "x", "y", "vx", "vy")]
    for t in range(1, n_steps):
        state = nbody_step(state, threshold).localCheckpoint()
        traces.append(state.select("pid", F.lit(t).alias("t"), "x", "y", "vx", "vy"))

    out = traces[0]
    for tr in traces[1:]:
        out = out.unionByName(tr)
    return out


def duckdb_oracle_sql(
    particles0_sql: str, n_steps: int, threshold: float = THRESHOLD
) -> str:
    """Unrolled DuckDB twin of :func:`nbody_simulate` (brute-force
    neighbor pairs — the oracle checks values, not plans). The scalar
    chain nests the same shared expressions; the force fold sums in
    the same ascending-neighbor-id order."""
    thr2 = repr(float(threshold) * float(threshold)) + "E0"
    ctes = [
        f"""n0 AS (
  SELECT pid, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y,
         0.0E0 AS vx, 0.0E0 AS vy,
         CAST(x AS DOUBLE) AS ppx, CAST(y AS DOUBLE) AS ppy
  FROM ({particles0_sql}))"""
    ]
    cap = accel_cap_exprs()
    for t in range(1, n_steps):
        # the coincident-coordinate guard mirrors _guarded_inv (the
        # reference's assert(x_delta != 0.0)) so a degenerate input
        # fails loudly on BOTH engines instead of hash-diverging
        fx = ("CASE WHEN b.x = a.x THEN error('nbody: coincident x') "
              "ELSE 1.0E0 / (b.x - a.x) END")
        fy = ("CASE WHEN b.y = a.y THEN error('nbody: coincident y') "
              "ELSE 1.0E0 / (b.y - a.y) END")
        ctes.append(f"""
f{t} AS (
  SELECT a.pid,
         list_aggregate(list({fx} ORDER BY b.pid), 'sum') AS ax,
         list_aggregate(list({fy} ORDER BY b.pid), 'sum') AS ay
  FROM n{t - 1} a JOIN n{t - 1} b
    ON a.pid <> b.pid
   AND (a.x - b.ppx) * (a.x - b.ppx) + (a.y - b.ppy) * (a.y - b.ppy) < {thr2}
  GROUP BY a.pid)""")
        inner = (
            f"SELECT s.pid, s.x, s.y, s.vx, s.vy, "
            f"COALESCE(f.ax, 0.0E0) AS ax, COALESCE(f.ay, 0.0E0) AS ay "
            f"FROM n{t - 1} s LEFT JOIN f{t} f USING (pid)"
        )
        for name, e in cap:
            inner = f"SELECT *, {e} AS {name} FROM ({inner})"
        ctes.append(
            f"n{t} AS (SELECT pid, x2 AS x, y2 AS y, vx2 AS vx, vy2 AS vy, "
            f"x AS ppx, y AS ppy FROM ({inner}))"
        )
    selects = " UNION ALL ".join(
        f"SELECT pid, {t} AS t, x, y, vx, vy FROM n{t}" for t in range(n_steps)
    )
    return "WITH " + ",".join(ctes) + " " + selects
