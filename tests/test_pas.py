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
