"""GCN inference vs dense numpy oracle (Â H W with symmetric norm)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from hoover_spark.operators.gcn import aggregate_features, gcn_inference, gcn_layer
from hoover_spark.operators.graph import graph_from_pairs
from hoover_spark.sources.synthetic import edges_to_pairs, two_cliques

D_IN, D_H, D_OUT = 4, 3, 2


def _features(n):
    rng = np.random.RandomState(3)
    return rng.randn(n, D_IN)


def _feat_df(spark, X):
    schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("h", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))], schema=schema
    )


def np_ahat(pairs, n):
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = A[d, s] = 1.0
    A += np.eye(n)
    dinv = 1.0 / np.sqrt(A.sum(1))
    return A * dinv[:, None] * dinv[None, :]


def test_aggregate_matches_numpy(spark):
    g = two_cliques(spark, k=4, bridge=True)
    n = 8
    X = _features(n)
    Ahat = np_ahat(edges_to_pairs(g), n)
    got = {r["vid"]: np.array(r["h"]) for r in
           aggregate_features(g, _feat_df(spark, X)).collect()}
    want = Ahat @ X
    for v in range(n):
        assert np.allclose(got[v], want[v], atol=1e-9), v


def test_aggregate_star_hub_100k(spark):
    """Hub with degree 10^5: the aggregation must not materialize the
    whole neighborhood in one row (posexplode + per-position SUM plan).
    Closed-form check with constant features h = [1.0] * d."""
    from pyspark.sql import functions as F
    from hoover_spark.operators.graph import Graph

    n = 100_000
    edges = spark.range(1, n + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    g = Graph(edges, num_partitions=8)
    d = 3
    feats = spark.range(n + 1).select(
        F.col("id").alias("vid"), F.array(*[F.lit(1.0)] * d).alias("h")
    )
    agg = aggregate_features(g, feats)

    plan = agg._jdf.queryExecution().executedPlan().toString()
    # the message fold must be a partial/final SUM, not a neighborhood
    # collect: posexplode feeds groupBy(vid, pos).sum
    assert "posexplode" in plan or "Generate" in plan

    hub = np.array(agg.where("vid = 0").first()["h"])
    leaf = np.array(agg.where("vid = 1").first()["h"])
    sq2, sqn = np.sqrt(2.0), np.sqrt(n + 1.0)
    want_hub = (n / sq2 + 1.0 / sqn) / sqn
    want_leaf = (1.0 / sqn + 1.0 / sq2) / sq2
    assert np.allclose(hub, want_hub, rtol=1e-9)
    assert np.allclose(leaf, want_leaf, rtol=1e-9)


def test_layer_and_stack_match_numpy(spark):
    g = two_cliques(spark, k=4, bridge=True)
    n = 8
    X = _features(n)
    rng = np.random.RandomState(5)
    W1, b1 = rng.randn(D_IN, D_H), rng.randn(D_H)
    W2, b2 = rng.randn(D_H, D_OUT), rng.randn(D_OUT)
    Ahat = np_ahat(edges_to_pairs(g), n)

    H1 = np.maximum(Ahat @ X @ W1 + b1, 0.0)
    H2 = Ahat @ H1 @ W2 + b2

    got1 = {r["vid"]: np.array(r["h"]) for r in
            gcn_layer(g, _feat_df(spark, X), W1, b1, activation="relu").collect()}
    for v in range(n):
        assert np.allclose(got1[v], H1[v], atol=1e-9)

    got2 = {r["vid"]: np.array(r["h"]) for r in
            gcn_inference(g, _feat_df(spark, X), [(W1, b1), (W2, b2)]).collect()}
    for v in range(n):
        assert np.allclose(got2[v], H2[v], atol=1e-9)
