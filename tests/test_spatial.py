"""Implicit-edge discovery vs brute-force numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from hoover_spark.operators.spatial import implicit_edges, reconcile_edges

N, R = 300, 0.15


def _points(seed=11):
    rng = np.random.RandomState(seed)
    return rng.rand(N, 3)


def _brute(P, r):
    out = set()
    for i in range(len(P)):
        d = np.sqrt(((P[i] - P[i + 1:]) ** 2).sum(1))
        for j in np.nonzero(d <= r)[0]:
            out.add((i, i + 1 + int(j)))
    return out


@pytest.fixture(scope="module")
def pts_df(spark):
    P = _points()
    return spark.createDataFrame(
        [(i, float(P[i, 0]), float(P[i, 1]), float(P[i, 2])) for i in range(N)],
        schema="id long, x double, y double, z double",
    )


def test_implicit_edges_match_bruteforce(spark, pts_df):
    got = {(r["id_a"], r["id_b"]) for r in
           implicit_edges(pts_df, "id", ["x", "y", "z"], R).collect()}
    assert got == _brute(_points(), R)


def test_distances_exact(spark, pts_df):
    P = _points()
    for r in implicit_edges(pts_df, "id", ["x", "y", "z"], R).collect():
        true = float(np.sqrt(((P[r["id_a"]] - P[r["id_b"]]) ** 2).sum()))
        assert r["dist"] == pytest.approx(true, abs=1e-12)


def test_reconcile_after_movement(spark, pts_df):
    before = implicit_edges(pts_df, "id", ["x", "y", "z"], R).select("id_a", "id_b")
    P2 = _points()
    P2[:30] = _points(seed=99)[:30]  # move 30 points
    moved = spark.createDataFrame(
        [(i, float(P2[i, 0]), float(P2[i, 1]), float(P2[i, 2])) for i in range(N)],
        schema="id long, x double, y double, z double",
    )
    created, deleted = reconcile_edges(before, moved, "id", ["x", "y", "z"], R)
    new_true = _brute(P2, R)
    old_true = _brute(_points(), R)
    assert {(r["id_a"], r["id_b"]) for r in created.collect()} == new_true - old_true
    assert {(r["id_a"], r["id_b"]) for r in deleted.collect()} == old_true - new_true
