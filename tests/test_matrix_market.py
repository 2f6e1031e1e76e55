"""Matrix-Market source: parse semantics + batch-vs-stream equivalence
on an MM fixture graph (reference: market_to_binary.c feeding
update_rates.cpp micro-batched ingestion)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hoover_spark.operators.graph import Graph
from hoover_spark.operators.wcc import wcc
from hoover_spark.sources.matrix_market import load_matrix_market, mm_declared_shape
from hoover_spark.streaming.ingest import run_stream

# two components: a 5-cycle (1-5) and a triangle (6-8); 1-based ids
MM_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (6, 7), (7, 8), (8, 6)]


def write_mm(path, edges, m=8):
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("% comment line that must be skipped\n")
        f.write(f"{m} {m} {len(edges)}\n")
        for i, j in edges:
            f.write(f"{i} {j}\n")


def test_parse_and_shape(spark, tmp_path):
    p = os.path.join(tmp_path, "g.mtx")
    write_mm(p, MM_EDGES)
    df = load_matrix_market(spark, p)
    got = {(r["src"], r["dst"]) for r in df.collect()}
    assert got == {(i - 1, j - 1) for i, j in MM_EDGES}
    assert mm_declared_shape(spark, p) == (8, 8, len(MM_EDGES))
    assert df.count() == 8


def test_weighted_body_rejected(spark, tmp_path):
    p = os.path.join(tmp_path, "w.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("3 3 2\n")
        f.write("1 2 0.5\n")
        f.write("2 3 1.5\n")
    with pytest.raises(ValueError):
        load_matrix_market(spark, p)


def test_mm_batch_vs_stream_equivalence(spark, tmp_path):
    """Final WCC labels after streaming the MM edges in 3 micro-batch
    drops == one batch run over the full MM edge set (reference
    analogue: update_rates.cpp streaming vs whole-graph load)."""
    p = os.path.join(tmp_path, "g.mtx")
    write_mm(p, MM_EDGES)
    edges = load_matrix_market(spark, p).localCheckpoint()

    batch_labels = {
        r["vid"]: r["label"] for r in wcc(Graph(edges, num_partitions=4)).collect()
    }

    drops = os.path.join(tmp_path, "drops")
    os.makedirs(drops)
    rows = edges.collect()
    for i in range(3):
        chunk = rows[i::3]
        spark.createDataFrame(chunk, schema="src long, dst long").coalesce(
            1
        ).write.parquet(os.path.join(tmp_path, f"stage{i}"))
        # move into the watched dir as one atomic drop
        stage = os.path.join(tmp_path, f"stage{i}")
        for name in os.listdir(stage):
            if name.endswith(".parquet"):
                os.rename(
                    os.path.join(stage, name), os.path.join(drops, f"drop{i}.parquet")
                )

    state = run_stream(
        spark, drops, os.path.join(tmp_path, "work"), kernel="wcc", num_partitions=4
    )
    stream_labels = {r["vid"]: r["label"] for r in state.state().collect()}
    assert stream_labels == batch_labels
