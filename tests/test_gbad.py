"""GBAD pattern mining vs a direct recursive python mirror of the
reference's ``explore_subgraphs`` (test/intrusion_detection.cpp:333-406)
— multiplicities included."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hoover_spark.operators.gbad import (
    MAX_SUBGRAPH_VERTICES,
    anomalies,
    frequent_patterns,
    pattern_counts,
)


def py_explore(adj: dict[int, list[int]]) -> Counter:
    """Recursive mirror of explore_subgraphs: every visited state
    increments counts[matrix]; expansion only while n < 4."""
    counts: Counter = Counter()

    def m_bit(i, j):
        return 1 << (i * MAX_SUBGRAPH_VERTICES + j)

    def explore(last, verts, matrix):
        counts[matrix] += 1
        if len(verts) < MAX_SUBGRAPH_VERTICES:
            for nb in adj.get(verts[last], []):
                if nb in verts:
                    i = verts.index(nb)
                    if not (matrix >> (i * 4 + last)) & 1:
                        explore(i, verts, matrix | m_bit(i, last) | m_bit(last, i))
                else:
                    verts.append(nb)
                    n = len(verts) - 1
                    explore(n, verts, matrix | m_bit(n, last) | m_bit(last, n))
                    verts.pop()

    for v in adj:
        explore(0, [v], 0)
    return counts


def _adj(pairs, n):
    adj = {v: [] for v in range(n)}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    return adj


def _spark_counts(spark, pairs, n):
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], schema="src long, dst long"
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = spark.range(n).select(F.col("id").alias("vid"))
    return pattern_counts(sym, verts)


FIXTURES = {
    "path4": ([(0, 1), (1, 2), (2, 3)], 4),
    "triangle_plus_tail": ([(0, 1), (1, 2), (0, 2), (2, 3)], 4),
    "star5": ([(0, i) for i in range(1, 5)], 5),
    "two_triangles_shared": ([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)], 5),
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_pattern_counts_match_reference_mirror(spark, name):
    pairs, n = FIXTURES[name]
    got = {
        r["matrix"]: r["count"] for r in _spark_counts(spark, pairs, n).collect()
    }
    want = dict(py_explore(_adj(pairs, n)))
    assert got == want, name


def test_frequent_and_anomalies(spark):
    """End-to-end: many disjoint triangles (the normative pattern) plus
    one path-of-3 (a near-miss: one edge short of a triangle)."""
    pairs = []
    n = 0
    for _ in range(6):  # six triangles
        pairs += [(n, n + 1), (n + 1, n + 2), (n, n + 2)]
        n += 3
    pairs += [(n, n + 1), (n + 1, n + 2)]  # one open path
    n += 3

    counts = _spark_counts(spark, pairs, n)
    freq = frequent_patterns(counts, top_k=3)
    rows = freq.orderBy("rank").collect()
    assert rows[0]["rank"] == 1 and rows[0]["score"] >= rows[-1]["score"]
    # the top normative pattern must contain at least one edge
    assert rows[0]["n_edges"] >= 1

    anom = anomalies(counts, freq, max_distance=2).collect()
    # anomalies are near-misses: not frequent, within 2 bits of one
    freq_matrices = {r["matrix"] for r in rows}
    for a in anom:
        assert a["matrix"] not in freq_matrices
        assert 1 <= a["dist"] <= 2
        assert a["nearest_frequent"] in freq_matrices


def test_default_degree_cap_bounds_hot_vertex(spark):
    """One hot vertex (star center, degree 200) must not blow up the
    ≤4-vertex state walk: the default-on cap excludes it and the walk
    stays polynomial; the spokes (now isolated) still enumerate as
    1-vertex states. Opting out (max_degree=None) must reproduce the
    exact uncapped reference mirror."""
    n = 201
    pairs = [(0, i) for i in range(1, n)]
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], schema="src long, dst long"
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = spark.range(n).select(F.col("id").alias("vid"))

    # the cap warning must fire, and its count comes from the
    # Observation riding the keep-set checkpoint (r4 ADVICE: no extra
    # eager count job) — "1 vertices" is the star center
    import pytest

    with pytest.warns(RuntimeWarning, match="excluded 1 vertices"):
        capped = {r["matrix"]: r["count"] for r in pattern_counts(sym, verts).collect()}
    # with the center dropped, every vertex is an isolated 1-vertex
    # state: exactly one pattern (empty matrix), n occurrences
    assert capped == {0: n}

    # a star small enough to pass the cap matches the uncapped walk
    small_pairs = [(0, i) for i in range(1, 6)]
    small_edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in small_pairs], schema="src long, dst long"
    )
    small_sym = small_edges.unionByName(
        small_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    small_verts = spark.range(6).select(F.col("id").alias("vid"))
    got_capped = {
        r["matrix"]: r["count"]
        for r in pattern_counts(small_sym, small_verts).collect()
    }
    got_uncapped = {
        r["matrix"]: r["count"]
        for r in pattern_counts(small_sym, small_verts, max_degree=None).collect()
    }
    assert got_capped == got_uncapped == dict(py_explore(_adj(small_pairs, 6)))
