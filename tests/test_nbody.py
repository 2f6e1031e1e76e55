"""nbody port (time-unrolled n-body with velocity, reference
test/simple_nbody_test.c) vs its unrolled DuckDB twin — EXACT float
comparison, including the order-sensitive force sums."""

from __future__ import annotations

import duckdb

from hoover_spark.operators.nbody import duckdb_oracle_sql, nbody_simulate
from hoover_spark.operators.pas import _dlit

STEPS = 5


def _particles0(spark, n=12):
    rows = [
        (
            i,
            ((i * 37 + 11) % 9973) / 9973.0 * 100.0,
            ((i * 53 + 29) % 9973) / 9973.0 * 100.0,
        )
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    # E-notation literals parse directly as DOUBLE (correctly-rounded
    # strtod); CAST(<decimal literal> AS DOUBLE) goes through a DECIMAL
    # whose int64 mantissa can exceed 2^53 and double-rounds
    vals = ", ".join(f"({p}, {_dlit(x)}, {_dlit(y)})" for p, x, y in rows)
    sql = f"SELECT * FROM (VALUES {vals}) AS t(pid, x, y)"
    return df, sql


def test_nbody_matches_duckdb_bitexact(spark):
    df, p0_sql = _particles0(spark)
    got = {
        (r["pid"], r["t"]): (r["x"], r["y"], r["vx"], r["vy"])
        for r in nbody_simulate(df, STEPS).collect()
    }
    want = {
        (pid, t): (x, y, vx, vy)
        for pid, t, x, y, vx, vy in duckdb.sql(
            duckdb_oracle_sql(p0_sql, STEPS)
        ).fetchall()
    }
    assert got == want  # exact bits, order-sensitive sums included


def test_nbody_isolated_particle_is_static(spark):
    """A particle with no neighbor within the threshold feels zero
    force and never moves (reference compute_accel over an empty
    neighbor set)."""
    rows = [(1, 10.0, 10.0), (2, 12.0, 11.0), (3, 90.0, 90.0)]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    tr = {(r["pid"], r["t"]): (r["x"], r["y"], r["vx"]) for r in nbody_simulate(df, 4).collect()}
    for t in range(4):
        assert tr[(3, t)] == (90.0, 90.0, 0.0)
    # the nearby pair does interact
    assert tr[(1, 1)][2] != 0.0


def test_nbody_coincident_coordinate_raises_both_engines(spark):
    """Two interacting particles sharing an exact coordinate must fail
    LOUDLY on both engines (the reference asserts x_delta != 0.0,
    compute_accel :103/:110) — not silently fold a NULL/inf force into
    the sum with cross-engine divergence (r3 ADVICE)."""
    import pytest

    rows = [(1, 5.0, 1.0), (2, 5.0, 3.0)]  # same x, well within threshold
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    with pytest.raises(Exception, match="coincident|x_delta"):
        nbody_simulate(df, 2).collect()
    p0_sql = "SELECT * FROM (VALUES (1, 5.0E0, 1.0E0), (2, 5.0E0, 3.0E0)) AS t(pid, x, y)"
    with pytest.raises(Exception, match="coincident"):
        duckdb.sql(duckdb_oracle_sql(p0_sql, 2)).fetchall()


def test_nbody_parallelism_invariance(spark):
    """The sorted-fold force sum makes results identical at any
    partitioning — the property a naive groupBy-SUM would not have."""
    df, _ = _particles0(spark, n=16)
    a = sorted(map(tuple, nbody_simulate(df.repartition(1), STEPS).collect()))
    b = sorted(map(tuple, nbody_simulate(df.repartition(5), STEPS).collect()))
    assert a == b


def _nbody_python_mirror(rows, n_steps, threshold=10.0):
    """Reference-derived re-derivation in plain Python floats — shares
    NO code with accel_cap_exprs / the oracle SQL (r3 ADVICE: a
    transcription error in a shared recipe passes both engines)."""
    import math

    DOMAIN, MAX_ACCEL = 100.0, 0.001
    thr2 = threshold * threshold
    st = {p: dict(x=float(x), y=float(y), vx=0.0, vy=0.0, ppx=float(x), ppy=float(y))
          for p, x, y in rows}
    trace = {(p, 0): (s["x"], s["y"], s["vx"], s["vy"]) for p, s in st.items()}
    for t in range(1, n_steps):
        new = {}
        for i, si in st.items():
            ax = ay = 0.0
            for j in sorted(st):  # ascending neighbor id — the fold order
                if j == i:
                    continue
                sj = st[j]
                dx, dy = si["x"] - sj["ppx"], si["y"] - sj["ppy"]
                if dx * dx + dy * dy < thr2:
                    ax = ax + 1.0 / (sj["x"] - si["x"])
                    ay = ay + 1.0 / (sj["y"] - si["y"])
            norm = math.sqrt(ax * ax + ay * ay)
            if norm > MAX_ACCEL:
                cax, cay = MAX_ACCEL * (ax / norm), MAX_ACCEL * (ay / norm)
            else:
                cax, cay = ax, ay
            vx, vy = si["vx"] + cax, si["vy"] + cay
            x = si["x"] + vx
            if x >= DOMAIN:
                x = si["x"] + vx - DOMAIN
            elif x < 0.0:
                x = si["x"] + vx + DOMAIN
            y = si["y"] + vy
            if y >= DOMAIN:
                y = si["y"] + vy - DOMAIN
            elif y < 0.0:
                y = si["y"] + vy + DOMAIN
            new[i] = dict(x=x, y=y, vx=vx, vy=vy, ppx=si["x"], ppy=si["y"])
        st = new
        for p, s in st.items():
            trace[(p, t)] = (s["x"], s["y"], s["vx"], s["vy"])
    return trace


def test_nbody_matches_independent_python_mirror(spark):
    rows = [
        (
            i,
            ((i * 37 + 11) % 9973) / 9973.0 * 100.0,
            ((i * 53 + 29) % 9973) / 9973.0 * 100.0,
        )
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "pid long, x double, y double")
    got = {
        (r["pid"], r["t"]): (r["x"], r["y"], r["vx"], r["vy"])
        for r in nbody_simulate(df, STEPS).collect()
    }
    want = _nbody_python_mirror(rows, STEPS)
    assert got == want
    # sanity: at least one interacting pair actually moved
    assert any(v[2] != 0.0 for v in want.values())
