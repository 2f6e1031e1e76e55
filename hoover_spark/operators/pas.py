"""Patch/agent SEIR epidemic over TWO coupled logical graphs (pas port).

Reference: ``test/pas.cpp`` — the reference's only multi-graph
application, exercising the graph-ID bitvector of
``inc/hvr_common.h:41-50``: a PATCH_GRAPH of grid cells carrying a
mosquito-population ODE (``pas.cpp:10``, ``update_patch`` :381-522) and
an AGENT_GRAPH of humans carrying SEIR health states (``pas.cpp:11``,
``update_agent`` :524-632), coupled per timestep through
``should_have_edge`` (:752-806): each vertex links to its own previous
timestep, each patch to the agents that occupied it one step earlier,
and each agent to its current patch one step earlier.

Spark mapping (the engine's standard time-unrolled iteration shape,
see :mod:`hoover_spark.operators.sir`):

- the two logical graphs are two state DataFrames; the cross-graph
  "edges" are the two joins the reference's edge rules induce —
  ``agents(t-1) groupBy patch`` (agent→patch edges, the Nh/Ih census of
  ``update_patch`` :409-430) and ``agents(t-1) ⋈ patches(t-1) on
  patch_id`` (patch→agent edges, the λ_h read of ``update_agent``
  :576-578). A ``graph_id`` column tags the union view
  (:func:`vertex_union`) exactly like the reference's GRAPH_FEAT
  attribute (``pas.cpp:12``, ``GRAPH_FEAT=9``);
- the mosquito ODE (RK4, ``update_patch`` :452-491) and the agent
  transition rules are plain arithmetic applied through **shared SQL
  expression strings** (`F.expr` on the Spark side, nested SELECTs on
  the DuckDB side — :func:`ode_substep_exprs`, :func:`agent_step_exprs`,
  :func:`duckdb_oracle_sql`), so both engines execute bit-identical
  IEEE operation sequences and the driver's hash gate can compare the
  full floating-point trace;
- per-timestep state is ``localCheckpoint``-ed — time iterates over
  data, not plan depth.

Deterministic re-expression (the reference seeds ``std::mt19937_64``
from ``std::random_device`` — ``pas.cpp:110`` — so **no two reference
runs agree either**; determinism is ours to define):

1. every RNG draw becomes a hash-uniform ``(a·id + b·t) % P / P`` on
   the vertex's own id and timestep;
2. ``p_StE = 1 - exp(-λ dt)`` (:160-162) becomes the algebraic CDF
   ``z/(1+z)`` with ``z = λ·dt`` — same limits and monotonicity, but
   rational arithmetic only, so both engines agree to the last bit
   (libm ``exp`` is not correctly rounded and may differ across
   engines); the *constant* probabilities PEtI/PItR (:99-101) keep the
   reference's exact ``1-exp`` form, precomputed host-side and inlined
   as double literals;
3. movement wraps toroidally instead of clipping at the grid boundary
   (``find_neighbor_patches`` :267-346 enumerates 4/6/9 candidates;
   wrapping keeps a uniform 9 — the reference picks among them with
   its RNG anyway);
4. the reference's ``update_agent`` :604 stores the new *activity*
   into ``AGENT_HEALTH`` — an evident bug (health would become 0-3
   uniformly on every move); we set AGENT_ACTIVITY;
5. ``patch_steps_per_agent_step`` (=50, :59) is a parameter
   (``substeps``), small in the graded config so the unrolled oracle
   SQL stays tractable — the recurrence is identical at any value.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

# --- reference constants, pas.cpp:66-101 -----------------------------------
PSI_V = 0.3                    # per-capita emergence rate
MU_V = 1.0 / 14.0              # per-capita death rate
R_V = PSI_V - MU_V             # intrinsic growth rate
KV = 2500.0                    # patch carrying capacity
SIGMA_V = 0.5                  # bites wanted per mosquito per unit time
SIGMA_H = 19.0                 # bites sustained per agent per unit time
BETA_HV = 0.33                 # mosquito→human transmission probability
BETA_VH = 0.33                 # human→mosquito transmission probability
NU_V = 0.1                     # mosquito E→I rate
NU_H = 1.0 / 5.0               # human E→I rate
MU_H = 1.0 / 6.0               # human recovery rate
AGENT_STEPS_PER_DAY = 8
DT_H = 1.0 / AGENT_STEPS_PER_DAY
#: activity tables, pas.cpp:49-50 (hard-coded to 4 activities)
ACTIVITIES_MAXSTAY = (2.0, 4.0, 6.0, 8.0)
ACTIVITIES_ALPHA = (1.0, 0.9, 0.8, 0.7)
#: constant transition probabilities, pas.cpp:99-101 (host-side exp —
#: inlined as literals so neither engine calls a libm exp at runtime)
PETI = 1.0 - math.exp(-DT_H * NU_H)
PITR = 1.0 - math.exp(-DT_H * MU_H)

#: graph ids (pas.cpp:10-11)
PATCH_GRAPH = 0
AGENT_GRAPH = 1


def _dlit(x: float) -> str:
    """A literal that parses as DOUBLE in both Spark SQL and DuckDB
    (decimal literals are DECIMAL-typed in both; the exponent forces
    double)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "E0"


# ---------------------------------------------------------------------------
# shared scalar recipes — the SAME strings run via F.expr and via DuckDB
# ---------------------------------------------------------------------------

def ode_substep_exprs(substeps: int) -> list[tuple[str, str]]:
    """One ``patch_steps_per_agent_step`` RK4 substep (``update_patch``
    :452-491), operating on columns (sv, ev, iv, nv, nhh, ihh) and
    producing (sv2, ev2, iv2, nv2). Mirrors the reference's exact
    operation order, including its quirks: Sv is committed *before* the
    Ev stage reads it, and Ev before the Iv stage (:464-487)."""
    dtv = _dlit(DT_H / substeps)
    mu, nu = _dlit(MU_V), _dlit(NU_V)
    # demand/supply/b of lambda_v & lambda_h (:129-156); Nv never hits 0
    # (logistic growth from Kv/2) but empty patches have Nhh = 0 → both
    # forces are 0 by definition (no hosts to bite)
    return [
        ("d", f"{_dlit(SIGMA_V)} * nv"),
        ("s", f"{_dlit(SIGMA_H)} * nhh"),
        ("b", "CASE WHEN d + s = 0.0E0 THEN 0.0E0 ELSE (d * s) / (d + s) END"),
        ("lv", f"CASE WHEN nhh = 0.0E0 THEN 0.0E0 "
               f"ELSE b / nv * {_dlit(BETA_HV)} * (ihh / nhh) END"),
        ("hv", f"({_dlit(PSI_V)} - {_dlit(R_V)} * nv / {_dlit(KV)}) * nv"),
        ("svk1", f"{dtv} * (hv - lv * sv - {mu} * sv)"),
        ("svk2", f"{dtv} * (hv - lv * (sv + svk1 / 2.0E0) - {mu} * (sv + svk1 / 2.0E0))"),
        ("svk3", f"{dtv} * (hv - lv * (sv + svk2 / 2.0E0) - {mu} * (sv + svk2 / 2.0E0))"),
        ("svk4", f"{dtv} * (hv - lv * (sv + svk3) - {mu} * (sv + svk3))"),
        ("sv2", "sv + (svk1 + 2.0E0 * (svk2 + svk3) + svk4) / 6.0E0"),
        # Ev stage reads the COMMITTED sv2 (reference :466-479)
        ("evk1", f"{dtv} * (lv * sv2 - {nu} * ev - {mu} * ev)"),
        ("evk2", f"{dtv} * (lv * (sv2 + svk1 / 2.0E0) - {nu} * (ev + evk1 / 2.0E0) - {mu} * (ev + evk1 / 2.0E0))"),
        ("evk3", f"{dtv} * (lv * (sv2 + svk2 / 2.0E0) - {nu} * (ev + evk2 / 2.0E0) - {mu} * (ev + evk2 / 2.0E0))"),
        ("evk4", f"{dtv} * (lv * (sv2 + svk3) - {nu} * (ev + evk3) - {mu} * (ev + evk3))"),
        ("ev2", "ev + (evk1 + 2.0E0 * (evk2 + evk3) + evk4) / 6.0E0"),
        # Iv stage reads the COMMITTED ev2 (reference :481-487)
        ("ivk1", f"{dtv} * ({nu} * ev2 - {mu} * iv)"),
        ("ivk2", f"{dtv} * ({nu} * (ev2 + evk1 / 2.0E0) - {mu} * (iv + ivk1 / 2.0E0))"),
        ("ivk3", f"{dtv} * ({nu} * (ev2 + evk2 / 2.0E0) - {mu} * (iv + ivk2 / 2.0E0))"),
        ("ivk4", f"{dtv} * ({nu} * (ev2 + evk3) - {mu} * (iv + ivk3))"),
        ("iv2", "iv + (ivk1 + 2.0E0 * (ivk2 + ivk3) + ivk4) / 6.0E0"),
        ("nv2", "sv2 + ev2 + iv2"),
    ]


#: λ_h after the last substep (``update_patch`` :493-496): recomputed
#: with the FINAL Nv/Iv of this agent-step
LAMBDA_H_EXPRS: list[tuple[str, str]] = [
    ("lhd", f"{_dlit(SIGMA_V)} * nv"),
    ("lhs", f"{_dlit(SIGMA_H)} * nhh"),
    ("lhb", "CASE WHEN lhd + lhs = 0.0E0 THEN 0.0E0 ELSE (lhd * lhs) / (lhd + lhs) END"),
    ("lh", f"CASE WHEN nhh = 0.0E0 THEN 0.0E0 "
           f"ELSE lhb / nhh * {_dlit(BETA_VH)} * (iv / nv) END"),
]

#: alpha-weighted census (``update_patch`` :439-448), fixed summand order
NHH_EXPRS: list[tuple[str, str]] = [
    ("nhh", "COALESCE(n0, 0) * 1.0E0 + COALESCE(n1, 0) * 0.9E0 "
            "+ COALESCE(n2, 0) * 0.8E0 + COALESCE(n3, 0) * 0.7E0"),
    ("ihh", "COALESCE(i0, 0) * 1.0E0 + COALESCE(i1, 0) * 0.9E0 "
            "+ COALESCE(i2, 0) * 0.8E0 + COALESCE(i3, 0) * 0.7E0"),
]


def agent_step_exprs(t: int, grid_dim: int) -> list[tuple[str, str]]:
    """One agent update (``update_agent`` :524-632) over columns
    (agent_id, home_patch, patch_prev, act_prev, stay_prev,
    health_prev, lh) → (health, patch, act, stay)."""
    d = grid_dim
    return [
        # health transition (:566-589); u is this (agent, t)'s draw
        ("u", f"CAST((agent_id * 1103 + {t} * 9677) % 999983 AS DOUBLE) / 999983.0E0"),
        ("alpha", "CASE WHEN act_prev = 0 THEN 1.0E0 WHEN act_prev = 1 THEN 0.9E0 "
                  "WHEN act_prev = 2 THEN 0.8E0 ELSE 0.7E0 END"),
        ("z", f"alpha * lh * {_dlit(DT_H)}"),
        ("pste", "z / (1.0E0 + z)"),  # deterministic stand-in for 1-exp(-z)
        ("health",
         "CASE WHEN health_prev < 0.5E0 THEN (CASE WHEN u < pste THEN 1.0E0 ELSE 0.0E0 END) "
         f"WHEN health_prev < 1.5E0 THEN (CASE WHEN u < {_dlit(PETI)} THEN 2.0E0 ELSE 1.0E0 END) "
         f"WHEN health_prev < 2.5E0 THEN (CASE WHEN u < {_dlit(PITR)} THEN 3.0E0 ELSE 2.0E0 END) "
         "ELSE 3.0E0 END"),
        # movement (:591-611): leave when the stay budget is exhausted
        ("maxstay", "CASE WHEN act_prev = 0 THEN 2.0E0 WHEN act_prev = 1 THEN 4.0E0 "
                    "WHEN act_prev = 2 THEN 6.0E0 ELSE 8.0E0 END"),
        ("moves", "stay_prev >= maxstay - 0.001E0"),
        # deterministic 3x3 neighbor-of-home pick, toroidal (see module
        # docstring #3); stand-in for move_to_new_patch (:352-369)
        ("mv", f"(agent_id * 9176 + {t} * 7351) % 9"),
        ("home_row", f"CAST(floor(home_patch / {float(d)!r}) AS BIGINT)"),
        ("home_col", f"home_patch % {d}"),
        ("dr", "CAST(floor(mv / 3.0E0) AS BIGINT) - 1"),
        ("dc", "(mv % 3) - 1"),
        ("new_patch", f"((home_row + dr + {d}) % {d}) * {d} + ((home_col + dc + {d}) % {d})"),
        ("new_act", f"(agent_id * 4243 + {t} * 2953) % 4"),
        ("patch", "CASE WHEN moves THEN new_patch ELSE patch_prev END"),
        ("act", "CASE WHEN moves THEN new_act ELSE act_prev END"),
        ("stay", "CASE WHEN moves THEN 0.0E0 ELSE stay_prev + 1.0E0 END"),
    ]


def _apply_exprs(df: DataFrame, exprs: list[tuple[str, str]]) -> DataFrame:
    """Layer shared scalar expressions one at a time (each may reference
    the previous), exactly how the oracle nests its SELECTs."""
    for name, sql in exprs:
        df = df.select("*", F.expr(sql).alias(name))
    return df


# ---------------------------------------------------------------------------
# the Spark simulation
# ---------------------------------------------------------------------------

def _census_aggs():
    # built lazily: F.expr needs an active SparkContext at call time
    return [
        F.expr(f"SUM(CASE WHEN act = {a} THEN 1 ELSE 0 END)").alias(f"n{a}")
        for a in range(4)
    ] + [
        F.expr(
            f"SUM(CASE WHEN act = {a} AND health > 1.5E0 AND health < 2.5E0 "
            "THEN 1 ELSE 0 END)"
        ).alias(f"i{a}")
        for a in range(4)
    ]

_PATCH_COLS = ["patch_id", "sv", "ev", "iv", "nv", "lh"]
_AGENT_COLS = ["agent_id", "home_patch", "patch", "act", "stay", "health"]


def initial_patches(spark: SparkSession, grid_dim: int) -> DataFrame:
    """Patch t=0 state (``init_patches``, pas.cpp:191-216)."""
    return spark.range(grid_dim * grid_dim).select(
        F.col("id").alias("patch_id"),
        F.lit(KV / 2.0).alias("sv"),
        F.lit(0.0).alias("ev"),
        F.lit(0.0).alias("iv"),
        F.lit(KV / 2.0).alias("nv"),
        F.lit(0.0).alias("lh"),
    )


def patch_step(patches: DataFrame, agents: DataFrame, substeps: int) -> DataFrame:
    """One patch-graph timestep as a (lazy) DataFrame plan: census of
    the agent graph at t-1 (the agent→patch DIRECTED_IN edges — the
    Nh/Ih census of ``update_patch`` :409-430), then ``substeps`` RK4
    substeps, then λ_h. Shared by :func:`pas_simulate` and the plan
    auditor (``tools/explain_plans.py``)."""
    ode = ode_substep_exprs(substeps)
    census = agents.groupBy(F.col("patch").alias("patch_id")).agg(*_census_aggs())
    pin = _apply_exprs(
        patches.drop("lh").join(census, on="patch_id", how="left"), NHH_EXPRS
    )
    for _ in range(substeps):
        pin = _apply_exprs(pin, ode).select(
            "patch_id", "nhh", "ihh",
            F.col("sv2").alias("sv"), F.col("ev2").alias("ev"),
            F.col("iv2").alias("iv"), F.col("nv2").alias("nv"),
        )
    return _apply_exprs(pin, LAMBDA_H_EXPRS).select(*_PATCH_COLS)


def agent_step(
    agents: DataFrame, patches: DataFrame, t: int, grid_dim: int
) -> DataFrame:
    """One agent-graph timestep as a (lazy) DataFrame plan: read λ_h
    from the patch occupied at t-1 (the patch→agent DIRECTED_IN edge,
    ``update_agent`` :576-578), then the shared transition/movement
    expressions."""
    ain = agents.select(
        "agent_id", "home_patch",
        F.col("patch").alias("patch_prev"),
        F.col("act").alias("act_prev"),
        F.col("stay").alias("stay_prev"),
        F.col("health").alias("health_prev"),
    ).join(
        patches.select(F.col("patch_id").alias("patch_prev"), "lh"),
        on="patch_prev",
    )
    return _apply_exprs(ain, agent_step_exprs(t, grid_dim)).select(*_AGENT_COLS)


def pas_simulate(
    agents0: DataFrame,
    n_steps: int,
    grid_dim: int = 8,
    substeps: int = 2,
    spark: SparkSession | None = None,
    checkpoints_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the coupled simulation; returns ``(agent_trace, patch_trace)``.

    ``agents0(agent_id, home_patch, act, health)`` is the t=0 agent
    graph (``init_agents``, pas.cpp:219-259; patch starts at home,
    stay at 0). ``agent_trace(agent_id, t, patch, act, stay, health)``,
    ``patch_trace(patch_id, t, sv, ev, iv, nv, lh)`` cover t=0..n_steps-1.

    The returned traces are unions over per-timestep localCheckpointed
    frames; pass ``checkpoints_out=[]`` to collect those frames so a
    long-lived caller can explicitly ``unpersist()`` the trace's RDD
    blocks when evicting it (unpersisting the union alone frees
    nothing — it holds no storage of its own).
    """
    spark = spark or agents0.sparkSession
    agents = agents0.select(
        "agent_id", "home_patch",
        F.col("home_patch").alias("patch"),
        F.col("act").cast("long").alias("act"),
        F.lit(0.0).alias("stay"),
        F.col("health").cast("double").alias("health"),
    ).localCheckpoint()
    patches = initial_patches(spark, grid_dim).localCheckpoint()
    if checkpoints_out is not None:
        checkpoints_out.extend((agents, patches))

    agent_traces = [agents.select("agent_id", F.lit(0).alias("t"), *_AGENT_COLS[2:])]
    patch_traces = [patches.select("patch_id", F.lit(0).alias("t"), *_PATCH_COLS[1:])]

    for t in range(1, n_steps):
        patches_t = patch_step(patches, agents, substeps).localCheckpoint()
        agents_t = agent_step(agents, patches, t, grid_dim).localCheckpoint()
        if checkpoints_out is not None:
            checkpoints_out.extend((agents_t, patches_t))
        agents, patches = agents_t, patches_t
        agent_traces.append(agents.select("agent_id", F.lit(t).alias("t"), *_AGENT_COLS[2:]))
        patch_traces.append(patches.select("patch_id", F.lit(t).alias("t"), *_PATCH_COLS[1:]))

    a_out, p_out = agent_traces[0], patch_traces[0]
    for a in agent_traces[1:]:
        a_out = a_out.unionByName(a)
    for p in patch_traces[1:]:
        p_out = p_out.unionByName(p)
    return a_out, p_out


def vertex_union(agent_trace: DataFrame, patch_trace: DataFrame) -> DataFrame:
    """The reference's single vertex space with a graph-ID tag
    (``GRAPH_FEAT``, pas.cpp:12 + ``inc/hvr_common.h:41-50``): one view
    over both logical graphs, the shape ``actor_to_partition`` (:372-379)
    dispatches on."""
    a = agent_trace.select(
        F.lit(AGENT_GRAPH).alias("graph_id"),
        F.col("agent_id").alias("vid"), "t",
        F.col("patch").alias("patch_id"), "health",
    )
    p = patch_trace.select(
        F.lit(PATCH_GRAPH).alias("graph_id"),
        F.col("patch_id").alias("vid"), "t",
        "patch_id", F.lit(None).cast("double").alias("health"),
    )
    return a.unionByName(p)


# ---------------------------------------------------------------------------
# the DuckDB twin
# ---------------------------------------------------------------------------

def _nest(inner: str, exprs: list[tuple[str, str]]) -> str:
    sql = inner
    for name, e in exprs:
        sql = f"SELECT *, {e} AS {name} FROM ({sql})"
    return sql


def duckdb_oracle_sql(
    agents0_sql: str,
    n_steps: int,
    grid_dim: int = 8,
    substeps: int = 2,
    output: str = "agents",
) -> str:
    """Unrolled DuckDB twin of :func:`pas_simulate`.

    ``agents0_sql`` must select ``(agent_id, home_patch, act, health)``.
    The scalar math nests the *same* expression strings the Spark side
    evaluates, so the IEEE op sequence is identical; only the
    relational plumbing (joins/census) is engine-specific.
    """
    ode = ode_substep_exprs(substeps)
    ctes = [
        f"""a0 AS (
  SELECT agent_id, home_patch, home_patch AS patch,
         CAST(act AS BIGINT) AS act, 0.0E0 AS stay,
         CAST(health AS DOUBLE) AS health
  FROM ({agents0_sql}))""",
        f"""p0 AS (
  SELECT r AS patch_id, {_dlit(KV / 2.0)} AS sv, 0.0E0 AS ev, 0.0E0 AS iv,
         {_dlit(KV / 2.0)} AS nv, 0.0E0 AS lh
  FROM range({grid_dim * grid_dim}) AS t(r))""",
    ]
    census_cols = ", ".join(
        [f"SUM(CASE WHEN act = {a} THEN 1 ELSE 0 END) AS n{a}" for a in range(4)]
        + [
            f"SUM(CASE WHEN act = {a} AND health > 1.5E0 AND health < 2.5E0 "
            f"THEN 1 ELSE 0 END) AS i{a}"
            for a in range(4)
        ]
    )
    for t in range(1, n_steps):
        pin = (
            f"SELECT p.patch_id, p.sv, p.ev, p.iv, p.nv, "
            f"c.n0, c.n1, c.n2, c.n3, c.i0, c.i1, c.i2, c.i3 "
            f"FROM p{t - 1} p LEFT JOIN cnt{t} c USING (patch_id)"
        )
        pin = _nest(pin, NHH_EXPRS)
        for _ in range(substeps):
            pin = (
                "SELECT patch_id, nhh, ihh, sv2 AS sv, ev2 AS ev, "
                f"iv2 AS iv, nv2 AS nv FROM ({_nest(pin, ode)})"
            )
        pin = _nest(pin, LAMBDA_H_EXPRS)
        ctes.append(
            f"cnt{t} AS (SELECT patch AS patch_id, {census_cols} "
            f"FROM a{t - 1} GROUP BY patch)"
        )
        ctes.append(
            f"p{t} AS (SELECT patch_id, sv, ev, iv, nv, lh FROM ({pin}))"
        )
        ain = (
            "SELECT a.agent_id, a.home_patch, a.patch AS patch_prev, "
            "a.act AS act_prev, a.stay AS stay_prev, a.health AS health_prev, "
            f"p.lh FROM a{t - 1} a JOIN p{t - 1} p ON a.patch = p.patch_id"
        )
        ctes.append(
            f"a{t} AS (SELECT agent_id, home_patch, patch, act, stay, health "
            f"FROM ({_nest(ain, agent_step_exprs(t, grid_dim))}))"
        )
    if output == "agents":
        selects = " UNION ALL ".join(
            f"SELECT agent_id, {t} AS t, patch, act, stay, health FROM a{t}"
            for t in range(n_steps)
        )
    else:
        selects = " UNION ALL ".join(
            f"SELECT patch_id, {t} AS t, sv, ev, iv, nv, lh FROM p{t}"
            for t in range(n_steps)
        )
    return "WITH " + ",\n".join(ctes) + "\n" + selects
