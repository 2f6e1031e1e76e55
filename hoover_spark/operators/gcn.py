"""GCN inference: per-vertex H' = act(Â·H·W) over the link graph.

Reference semantics: ``test/gcn.cpp:63-70`` — each vertex multiplies
its gathered neighbor features by a weight matrix (per-vertex A·X·W
with bounded neighbor count). The reference treats this as a per-vertex
callback over mirrored neighbors; here one GCN layer is the canonical
Spark decomposition:

1. **aggregate** (the sparse Â·H product) — a join + groupBy SUM over
   feature arrays, i.e. exactly the PageRank message plan with a vector
   payload: ``edges ⋈ features`` then ``zip_with`` accumulation. With
   symmetric normalization Â = D^-1/2 (A+I) D^-1/2, each message is
   ``h_src / sqrt(deg_src · deg_dst)``; self-loop term folded in.
2. **transform** (·W + bias, activation) — a dense (batch × d_in) ×
   (d_in, d_out) matmul: an Arrow-batched pandas UDF doing one numpy
   GEMM per batch (the sanctioned Python path — per-batch BLAS, never
   per-row Python).

Weights are a driver-side numpy array (models are small; the graph is
what's big) broadcast to executors automatically via closure capture.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from hoover_spark.operators.graph import Graph


def aggregate_features(
    graph: Graph, features: DataFrame, vec_col: str = "h"
) -> DataFrame:
    """(vid, h) — symmetric-normalized neighborhood sum
    Â·H with Â = D^-1/2 (A+I) D^-1/2 (Kipf-Welling GCN propagation).

    Pure join+agg: the message plan is identical to the PageRank
    iteration (SURVEY.md §2 A1/J3) with an array payload; the SUM is
    an element-wise ``zip_with`` fold, map-side combined."""
    deg = graph.degrees()
    feat = features.select("vid", F.col(vec_col).alias("h"))
    norm = feat.join(deg, on="vid").select(
        "vid",
        F.col("degree"),
        F.transform(
            "h", lambda x: x / F.sqrt((F.col("degree") + 1).cast("double"))
        ).alias("hn"),
    )
    msgs = (
        graph.sym_edges()
        .join(norm.select(F.col("vid").alias("src"), "hn"), on="src")
        .select(F.col("dst").alias("vid"), "hn")
        # self-loop term (A+I): every vertex also messages itself
        .unionByName(norm.select("vid", "hn"))
    )
    # Element-wise sum as posexplode → partial/final SUM per (vid, pos)
    # → reassemble ordered by pos. Never materializes a whole
    # neighborhood in one row (collect_list + fold would put
    # degree × dim doubles into a single row — an OOM/straggler on any
    # skewed graph; the reference caps neighbors at 10, we cannot), and
    # the per-position SUM combines map-side, so a 10^6-degree hub
    # shuffles at most n_map_partitions × dim partial rows.
    summed = (
        msgs.select("vid", F.posexplode("hn").alias("pos", "val"))
        .groupBy("vid", "pos")
        .agg(F.sum("val").alias("s"))
        .groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .select("vid", F.transform("ps", lambda x: x["s"]).alias("hsum"))
    )
    return summed.join(deg, on="vid").select(
        "vid",
        F.transform(
            "hsum", lambda x: x / F.sqrt((F.col("degree") + 1).cast("double"))
        ).alias("h"),
    )


def gcn_layer(
    graph: Graph,
    features: DataFrame,
    weights: np.ndarray,
    bias: np.ndarray | None = None,
    activation: str = "relu",
    vec_col: str = "h",
) -> DataFrame:
    """One GCN layer: act(Â·H·W + b) → (vid, h: array<double>)."""
    agg = aggregate_features(graph, features, vec_col=vec_col)
    w = np.asarray(weights, dtype=np.float64)
    b = np.zeros(w.shape[1]) if bias is None else np.asarray(bias, dtype=np.float64)
    assert activation in ("relu", "none")

    schema = T.StructType(
        [
            T.StructField("vid", T.LongType(), False),
            T.StructField("h", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            H = np.stack(pdf["h"].to_numpy())  # (batch, d_in)
            out = H @ w + b                     # one GEMM per Arrow batch
            if activation == "relu":
                np.maximum(out, 0.0, out=out)
            yield pd.DataFrame({"vid": pdf["vid"], "h": list(out)})

    return agg.mapInPandas(transform, schema=schema)


def gcn_inference(
    graph: Graph,
    features: DataFrame,
    layers: list[tuple[np.ndarray, np.ndarray | None]],
    vec_col: str = "h",
) -> DataFrame:
    """Stacked GCN layers (ReLU between, linear last) — full-graph
    inference as |layers| rounds of join+agg+GEMM."""
    h = features.select("vid", F.col(vec_col).alias("h"))
    for i, (w, b) in enumerate(layers):
        act = "relu" if i < len(layers) - 1 else "none"
        h = gcn_layer(graph, h, w, b, activation=act)
        h = h.localCheckpoint()  # truncate lineage between layers
    return h
