"""SIR layered-graph propagation vs a direct python mirror of the
reference recurrence (test/infectious_test.c:84-99, :182-210)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hoover_spark.operators.sir import sir_layers, sir_propagate, sir_summary

N, T, R = 60, 5, 0.12


def make_actors(spark, n=N):
    k = F.col("id")
    return spark.range(n).select(
        k.alias("actor_id"),
        (F.pmod(k * 37 + 11, F.lit(199)) / 199.0).alias("x0"),
        (F.pmod(k * 53 + 29, F.lit(199)) / 199.0).alias("y0"),
        (F.pmod(k * 61 + 7, F.lit(199)) / 199.0).alias("dst_x"),
        (F.pmod(k * 17 + 3, F.lit(199)) / 199.0).alias("dst_y"),
        (F.pmod(k, F.lit(19)) == 0).alias("infected0"),
    )


def py_step(x, y, dx, dy):
    if abs(x - dx) < 1e-9 or abs(y - dy) < 1e-9:
        x, y = dx, dy
    vx, vy = dx - x, dy - y
    mag = 5.0 * math.sqrt(vx * vx + vy * vy)
    nvx = 0.0 if mag == 0.0 else vx / mag
    nvy = 0.0 if mag == 0.0 else vy / mag
    if abs(vx) > abs(nvx):
        vx = nvx
    if abs(vy) > abs(nvy):
        vy = nvy
    nx, ny = x + vx, y + vy
    if nx >= 1.0:
        nx -= 1.0
    if nx < 0.0:
        nx += 1.0
    if ny >= 1.0:
        ny -= 1.0
    if ny < 0.0:
        ny += 1.0
    return nx, ny


def py_sir(n=N, t_max=T, r=R):
    """prev-position layers + infection recurrence, bit-exact."""
    pos = {}
    for a in range(n):
        x = ((a * 37 + 11) % 199) / 199.0
        y = ((a * 53 + 29) % 199) / 199.0
        dx = ((a * 61 + 7) % 199) / 199.0
        dy = ((a * 17 + 3) % 199) / 199.0
        pos[a] = [(x, y)]
        for _ in range(1, t_max):
            x, y = py_step(x, y, dx, dy)
            pos[a].append((x, y))
    # ppx/ppy of layer t = pos at t-1 (layer 0: its own start)
    pp = {a: [pos[a][0]] + pos[a][:-1] for a in range(n)}
    inf = {(a, 0): a % 19 == 0 for a in range(n)}
    for t in range(1, t_max):
        carriers = [pp[b][t - 1] for b in range(n) if inf[(b, t - 1)]]
        for a in range(n):
            hit = any(
                (pp[a][t][0] - cx) ** 2 + (pp[a][t][1] - cy) ** 2 <= r * r
                for cx, cy in carriers
            )
            inf[(a, t)] = inf[(a, t - 1)] or hit
    return inf


def test_sir_trace_matches_python_mirror(spark):
    layers = sir_layers(make_actors(spark), T)
    trace = sir_propagate(layers, R, T)
    got = {(r["actor_id"], r["t"]): r["infected"] for r in trace.collect()}
    want = py_sir()
    assert got == want


def test_sir_monotone_and_summary(spark):
    layers = sir_layers(make_actors(spark), T)
    trace = sir_propagate(layers, R, T)
    rows = sorted(
        sir_summary(trace).collect(), key=lambda r: r["t"]
    )
    counts = [r["n_infected"] for r in rows]
    assert len(counts) == T
    assert counts == sorted(counts)  # infection never recovers (SI model)
    assert counts[0] == sum(1 for a in range(N) if a % 19 == 0)
    assert counts[-1] > counts[0]  # it actually spread
