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


def test_nbody_parallelism_invariance(spark):
    """The sorted-fold force sum makes results identical at any
    partitioning — the property a naive groupBy-SUM would not have."""
    df, _ = _particles0(spark, n=16)
    a = sorted(map(tuple, nbody_simulate(df.repartition(1), STEPS).collect()))
    b = sorted(map(tuple, nbody_simulate(df.repartition(5), STEPS).collect()))
    assert a == b
