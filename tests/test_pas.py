"""pas port (patch/agent SEIR over two coupled logical graphs,
reference test/pas.cpp) vs its unrolled DuckDB twin — EXACT float
comparison, stronger than the driver gate's 6-dp rounding."""

from __future__ import annotations

import duckdb

from hoover_spark.operators.pas import (
    AGENT_GRAPH,
    PATCH_GRAPH,
    duckdb_oracle_sql,
    pas_simulate,
    vertex_union,
)

GRID = 4
STEPS = 4
SUBSTEPS = 2


def _agents0(spark, n=40):
    rows = [
        (i, (i * 13 + 5) % (GRID * GRID), i % 4, 2.0 if i % 10 == 0 else 0.0)
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(
        rows, "agent_id long, home_patch long, act long, health double"
    )
    vals = ", ".join(
        f"({a}, {hp}, {ac}, CAST({he!r} AS DOUBLE))" for a, hp, ac, he in rows
    )
    sql = f"SELECT * FROM (VALUES {vals}) AS t(agent_id, home_patch, act, health)"
    return df, sql


def test_pas_agents_match_duckdb_bitexact(spark):
    df, a0_sql = _agents0(spark)
    a, _ = pas_simulate(df, STEPS, GRID, SUBSTEPS)
    got = {
        (r["agent_id"], r["t"]): (r["patch"], r["act"], r["stay"], r["health"])
        for r in a.collect()
    }
    want = {
        (aid, t): (patch, act, stay, health)
        for aid, t, patch, act, stay, health in duckdb.sql(
            duckdb_oracle_sql(a0_sql, STEPS, GRID, SUBSTEPS, output="agents")
        ).fetchall()
    }
    assert got == want  # exact — including every double bit


def test_pas_patches_match_duckdb_bitexact(spark):
    df, a0_sql = _agents0(spark)
    _, p = pas_simulate(df, STEPS, GRID, SUBSTEPS)
    got = {
        (r["patch_id"], r["t"]): (r["sv"], r["ev"], r["iv"], r["nv"], r["lh"])
        for r in p.collect()
    }
    want = {
        (pid, t): vals
        for pid, t, *vals in duckdb.sql(
            duckdb_oracle_sql(a0_sql, STEPS, GRID, SUBSTEPS, output="patches")
        ).fetchall()
    }
    want = {k: tuple(v) for k, v in want.items()}
    assert got == want


def test_pas_invariants(spark):
    df, _ = _agents0(spark)
    a, p = pas_simulate(df, STEPS, GRID, SUBSTEPS)
    arows = a.collect()
    # health only moves forward: S(0) -> E(1) -> I(2) -> R(3)
    byagent: dict[int, list] = {}
    for r in arows:
        byagent.setdefault(r["agent_id"], []).append((r["t"], r["health"]))
    for hs in byagent.values():
        hs.sort()
        assert all(h1 <= h2 for (_, h1), (_, h2) in zip(hs, hs[1:]))
    # patches stay on the grid; mosquito population stays positive
    assert all(0 <= r["patch"] < GRID * GRID for r in arows)
    assert all(r["nv"] > 0 for r in p.collect())


def test_pas_vertex_union_two_graphs(spark):
    """The graph-ID-tagged union view (reference GRAPH_FEAT,
    inc/hvr_common.h:41-50): both logical graphs in one vertex space."""
    df, _ = _agents0(spark, n=10)
    a, p = pas_simulate(df, 2, GRID, 1)
    u = vertex_union(a, p)
    counts = {r["graph_id"]: r["n"] for r in u.groupBy("graph_id").count().withColumnRenamed("count", "n").collect()}
    assert counts[AGENT_GRAPH] == 10 * 2
    assert counts[PATCH_GRAPH] == GRID * GRID * 2


def test_pas_parallelism_invariance(spark):
    """Identical bits at any input partitioning (the census is integer
    counts; every fp chain is per-row)."""
    df, _ = _agents0(spark, n=30)
    a1, p1 = pas_simulate(df.repartition(1), STEPS, GRID, SUBSTEPS)
    a7, p7 = pas_simulate(df.repartition(7), STEPS, GRID, SUBSTEPS)
    key = lambda r: (r["agent_id"], r["t"])  # noqa: E731
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a7.collect()))
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p7.collect()))


# ---------------------------------------------------------------------------
# Independent mirror (r3 ADVICE): the DuckDB oracle nests the SAME
# expression strings the Spark side executes, so the hash gate alone
# cannot catch a transcription error in a shared recipe. This mirror
# re-derives the whole recurrence from the reference's formulas
# (update_patch pas.cpp:381-522, update_agent :524-632) in plain Python
# floats — independent of ode_substep_exprs / agent_step_exprs — and
# demands bit-exact agreement.
# ---------------------------------------------------------------------------

def _pas_python_mirror(agents0, n_steps, grid_dim, substeps):
    import math

    PSI_V = 0.3
    MU_V = 1.0 / 14.0
    R_V = PSI_V - MU_V
    KV = 2500.0
    SIGMA_V = 0.5
    SIGMA_H = 19.0
    BETA_HV = 0.33
    BETA_VH = 0.33
    NU_V = 0.1
    NU_H = 1.0 / 5.0
    MU_H = 1.0 / 6.0
    DT_H = 1.0 / 8.0
    PETI = 1.0 - math.exp(-DT_H * NU_H)
    PITR = 1.0 - math.exp(-DT_H * MU_H)
    dtv = DT_H / substeps
    W = (1.0, 0.9, 0.8, 0.7)
    MAXSTAY = (2.0, 4.0, 6.0, 8.0)

    agents = {
        a["agent_id"]: dict(
            home=a["home_patch"], patch=a["home_patch"],
            act=int(a["act"]), stay=0.0, health=float(a["health"]),
        )
        for a in agents0
    }
    n_patch = grid_dim * grid_dim
    patches = {
        p: dict(sv=KV / 2.0, ev=0.0, iv=0.0, nv=KV / 2.0, lh=0.0)
        for p in range(n_patch)
    }
    atrace = {
        (i, 0): (s["patch"], s["act"], s["stay"], s["health"])
        for i, s in agents.items()
    }
    ptrace = {
        (p, 0): (d["sv"], d["ev"], d["iv"], d["nv"], d["lh"])
        for p, d in patches.items()
    }

    for t in range(1, n_steps):
        new_patches = {}
        for p in range(n_patch):
            n = [0, 0, 0, 0]
            inf = [0, 0, 0, 0]
            for s in agents.values():
                if s["patch"] == p:
                    n[s["act"]] += 1
                    if 1.5 < s["health"] < 2.5:
                        inf[s["act"]] += 1
            nhh = n[0] * 1.0 + n[1] * 0.9 + n[2] * 0.8 + n[3] * 0.7
            ihh = inf[0] * 1.0 + inf[1] * 0.9 + inf[2] * 0.8 + inf[3] * 0.7
            st = patches[p]
            sv, ev, iv, nv = st["sv"], st["ev"], st["iv"], st["nv"]
            for _ in range(substeps):
                d_ = SIGMA_V * nv
                s_ = SIGMA_H * nhh
                b = 0.0 if d_ + s_ == 0.0 else (d_ * s_) / (d_ + s_)
                lv = 0.0 if nhh == 0.0 else b / nv * BETA_HV * (ihh / nhh)
                hv = (PSI_V - R_V * nv / KV) * nv
                mu, nu = MU_V, NU_V
                svk1 = dtv * (hv - lv * sv - mu * sv)
                svk2 = dtv * (hv - lv * (sv + svk1 / 2.0) - mu * (sv + svk1 / 2.0))
                svk3 = dtv * (hv - lv * (sv + svk2 / 2.0) - mu * (sv + svk2 / 2.0))
                svk4 = dtv * (hv - lv * (sv + svk3) - mu * (sv + svk3))
                sv2 = sv + (svk1 + 2.0 * (svk2 + svk3) + svk4) / 6.0
                evk1 = dtv * (lv * sv2 - nu * ev - mu * ev)
                evk2 = dtv * (lv * (sv2 + svk1 / 2.0) - nu * (ev + evk1 / 2.0) - mu * (ev + evk1 / 2.0))
                evk3 = dtv * (lv * (sv2 + svk2 / 2.0) - nu * (ev + evk2 / 2.0) - mu * (ev + evk2 / 2.0))
                evk4 = dtv * (lv * (sv2 + svk3) - nu * (ev + evk3) - mu * (ev + evk3))
                ev2 = ev + (evk1 + 2.0 * (evk2 + evk3) + evk4) / 6.0
                ivk1 = dtv * (nu * ev2 - mu * iv)
                ivk2 = dtv * (nu * (ev2 + evk1 / 2.0) - mu * (iv + ivk1 / 2.0))
                ivk3 = dtv * (nu * (ev2 + evk2 / 2.0) - mu * (iv + ivk2 / 2.0))
                ivk4 = dtv * (nu * (ev2 + evk3) - mu * (iv + ivk3))
                iv2 = iv + (ivk1 + 2.0 * (ivk2 + ivk3) + ivk4) / 6.0
                nv2 = sv2 + ev2 + iv2
                sv, ev, iv, nv = sv2, ev2, iv2, nv2
            lhd = SIGMA_V * nv
            lhs = SIGMA_H * nhh
            lhb = 0.0 if lhd + lhs == 0.0 else (lhd * lhs) / (lhd + lhs)
            lh = 0.0 if nhh == 0.0 else lhb / nhh * BETA_VH * (iv / nv)
            new_patches[p] = dict(sv=sv, ev=ev, iv=iv, nv=nv, lh=lh)

        new_agents = {}
        for i, s in agents.items():
            lh = patches[s["patch"]]["lh"]  # patch state at t-1
            u = float((i * 1103 + t * 9677) % 999983) / 999983.0
            alpha = W[s["act"]]
            z = alpha * lh * DT_H
            pste = z / (1.0 + z)
            h = s["health"]
            if h < 0.5:
                h2 = 1.0 if u < pste else 0.0
            elif h < 1.5:
                h2 = 2.0 if u < PETI else 1.0
            elif h < 2.5:
                h2 = 3.0 if u < PITR else 2.0
            else:
                h2 = 3.0
            if s["stay"] >= MAXSTAY[s["act"]] - 0.001:
                mv = (i * 9176 + t * 7351) % 9
                hr, hc = s["home"] // grid_dim, s["home"] % grid_dim
                dr, dc = mv // 3 - 1, mv % 3 - 1
                patch = ((hr + dr + grid_dim) % grid_dim) * grid_dim + (
                    (hc + dc + grid_dim) % grid_dim
                )
                act = (i * 4243 + t * 2953) % 4
                stay = 0.0
            else:
                patch, act, stay = s["patch"], s["act"], s["stay"] + 1.0
            new_agents[i] = dict(
                home=s["home"], patch=patch, act=act, stay=stay, health=h2
            )
        agents, patches = new_agents, new_patches
        for i, s in agents.items():
            atrace[(i, t)] = (s["patch"], s["act"], s["stay"], s["health"])
        for p, d in patches.items():
            ptrace[(p, t)] = (d["sv"], d["ev"], d["iv"], d["nv"], d["lh"])
    return atrace, ptrace


def test_pas_matches_independent_python_mirror(spark):
    """Bit-exact agreement with a from-the-reference re-derivation that
    shares NO code with the engine's expression strings."""
    from hoover_spark.operators.pas import pas_simulate

    agents0 = [
        dict(agent_id=1, home_patch=0, act=0, health=2.0),  # infectious
        dict(agent_id=2, home_patch=0, act=1, health=0.0),
        dict(agent_id=3, home_patch=1, act=2, health=0.0),
        dict(agent_id=4, home_patch=2, act=3, health=1.0),  # exposed
        dict(agent_id=5, home_patch=3, act=0, health=0.0),
        dict(agent_id=6, home_patch=3, act=1, health=3.0),  # recovered
    ]
    df = spark.createDataFrame(
        [(a["agent_id"], a["home_patch"], a["act"], a["health"]) for a in agents0],
        "agent_id long, home_patch long, act long, health double",
    )
    a, p = pas_simulate(df, n_steps=6, grid_dim=2, substeps=2, spark=spark)
    got_a = {
        (r["agent_id"], r["t"]): (r["patch"], r["act"], r["stay"], r["health"])
        for r in a.collect()
    }
    got_p = {
        (r["patch_id"], r["t"]): (r["sv"], r["ev"], r["iv"], r["nv"], r["lh"])
        for r in p.collect()
    }
    want_a, want_p = _pas_python_mirror(agents0, 6, 2, 2)
    assert got_a == want_a
    assert got_p == want_p
    # sanity on the physics: the infectious seed must expose someone /
    # the co-located patch must develop mosquito infection pressure
    assert any(v[4] > 0.0 for k, v in want_p.items() if k[1] == 5)
