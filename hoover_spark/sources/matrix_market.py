"""Matrix-Market edge-list source — the interchange format of the
reference's own benchmark graphs.

``test/market_to_binary.c:1-69`` converts MM coordinate/pattern files
(LAW in-2004, SNAP soc-LiveJournal1 — ``test/update_rates.cpp:13-16``)
to per-PE binary chunks for streaming ingestion. Here the whole parse
is a distributed ``spark.read.text``: comment lines dropped, the
single ``M N nz`` size line recognized by its arity, data lines
``i j`` re-based from 1- to 0-based (:45-48) — no driver-side file
I/O, so a 100 GB .mtx parses with full parallelism.

Only ``coordinate pattern`` bodies are supported (2-token data lines),
exactly the subset ``market_to_binary.c`` asserts (:26-29); weighted
``coordinate real`` bodies (3-token data lines after the size line)
raise rather than silently mis-parse.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_matrix_market(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """``edges(src, dst)`` (0-based) from a Matrix-Market
    coordinate/pattern file.

    ``validate=True`` (default) runs two extra validation scans (reject
    >3-field lines, require exactly one size line). On a ~100 GB .mtx
    those scans double the load cost — pass ``validate=False`` after
    the file's shape is known (e.g. a re-read of an already-ingested
    graph) and rely on :func:`mm_declared_shape` vs the parsed count."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    data = (
        lines.where(~F.col("value").startswith("%"))
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(toks.alias("t"))
    )
    if validate:
        # the size line 'M N nz' is the only 3-token row in a pattern body
        bad = data.where(F.size("t") > 3).limit(1).count()
        if bad:
            raise ValueError(
                f"{path}: not a coordinate/pattern Matrix-Market body "
                "(found a line with >3 fields)"
            )
        n_size_lines = data.where(F.size("t") == 3).count()
        if n_size_lines != 1:
            raise ValueError(
                f"{path}: expected exactly one 'M N nz' size line, found "
                f"{n_size_lines} 3-field lines — weighted (coordinate real) "
                "bodies are not supported, mirroring market_to_binary.c:26-29"
            )
    return data.where(F.size("t") == 2).select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
    )


def load_binary_edges(
    spark: SparkSession, path: str, num_partitions: int | None = None
) -> DataFrame:
    """``edges(src, dst)`` from the reference's binary edge format.

    ``test/market_to_binary.c:54-66`` writes a little-endian int32
    layout: header ``M, N, nz`` then the full ``I[nz]`` array then
    ``J[nz]`` (columnar, not interleaved); ``test/update_rates.cpp``
    streams edges from these files. The format is inherently one blob
    per graph (Spark's binaryFile source is not splittable), so decode
    parallelism is per-*file*: each file is one numpy ``frombuffer``
    (vectorized, no per-edge Python) emitted in bounded Arrow chunks;
    pass ``num_partitions`` to spread the decoded edges before any
    downstream shuffle. A directory of per-chunk files (how the
    reference shards per PE) decodes fully in parallel.
    """
    import numpy as np
    import pandas as pd

    bf = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        chunk = 1 << 20  # 1M edges per Arrow batch — bounds decode memory
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                buf = np.frombuffer(content, dtype="<i4")
                if len(buf) < 3:
                    raise ValueError(f"{fpath}: truncated header")
                nz = int(buf[2])
                if len(buf) != 3 + 2 * nz:
                    raise ValueError(
                        f"{fpath}: expected {3 + 2 * nz} int32 words for "
                        f"nz={nz}, found {len(buf)}"
                    )
                src = buf[3 : 3 + nz].astype("int64")
                dst = buf[3 + nz : 3 + 2 * nz].astype("int64")
                for lo in range(0, nz, chunk):
                    yield pd.DataFrame(
                        {"src": src[lo : lo + chunk], "dst": dst[lo : lo + chunk]}
                    )

    edges = bf.mapInPandas(decode, schema="src long, dst long")
    return edges.repartition(num_partitions) if num_partitions else edges


def binary_edges_shape(content: bytes) -> tuple[int, int, int]:
    """(M, N, nz) from a binary edge blob's 12-byte header."""
    import numpy as np

    m, n, nz = np.frombuffer(content[:12], dtype="<i4")
    return int(m), int(n), int(nz)


def mm_declared_shape(spark: SparkSession, path: str) -> tuple[int, int, int]:
    """(M, N, nz) from the size line — for validation against the
    parsed edge count."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    row = (
        lines.where(~F.col("value").startswith("%"))
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(toks.alias("t"))
        .where(F.size("t") == 3)
        .first()
    )
    m, n, nz = (int(x) for x in row["t"])
    return m, n, nz
