"""Micro-bench for the batch-vectorized shingle kernel (VERDICT r4 #5).

Times :func:`hoover_spark.functions.text.code_segments` (round-5
batch-vectorized: one Arrow buffer decode + batch-wide polynomial
passes + one gather) against the retained per-document reference loop
(``_code_segments_perdoc``) on ≥1M SHORT documents — the regime where
per-document Python overhead dominates the O(|text|·k) arithmetic.
Pure pandas-batch timing (no Spark): both paths are the inside of the
same mapInPandas, so the kernel-only ratio is the honest number.

Writes bench_text_kernel.json and prints it.

Usage: python tools/text_kernel_bench.py [n_docs] [batch_rows]
"""

from __future__ import annotations

import json
import statistics
import time

import numpy as np
import pandas as pd

from hoover_spark.functions.text import _code_segments_perdoc, code_segments


def make_batches(n_docs: int, batch_rows: int) -> list[pd.DataFrame]:
    """Deterministic short docs (~40 chars median, some unicode, some
    too-short/null rows) pre-split into Arrow-sized pandas batches."""
    rng = np.random.default_rng(7)
    lens = rng.integers(2, 80, size=n_docs)  # some < k=5 → skipped
    words = np.array(["the", "code", "graph", "wörld", "page", "rank",
                      "spark", "link", "δelta", "node"])
    batches = []
    for lo in range(0, n_docs, batch_rows):
        hi = min(lo + batch_rows, n_docs)
        texts: list[str | None] = []
        for i in range(lo, hi):
            if i % 997 == 0:
                texts.append(None)
                continue
            w = words[rng.integers(0, len(words), size=max(1, lens[i] // 5))]
            texts.append(" ".join(w.tolist())[: lens[i]])
        batches.append(pd.DataFrame(
            {"id": np.arange(lo, hi, dtype=np.int64), "text": texts}))
    return batches


def timed(fn, batches, k: int, reps: int = 3) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for pdf in batches:
            fn(pdf, k)
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3)


def main() -> None:
    import sys

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    k = 5
    batches = make_batches(n_docs, batch_rows)
    # correctness cross-check on the first batch before timing
    a, b = code_segments(batches[0], k), _code_segments_perdoc(batches[0], k)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))

    wall_vec = timed(code_segments, batches, k)
    wall_loop = timed(_code_segments_perdoc, batches, k)
    out = {
        "n_docs": n_docs,
        "batch_rows": batch_rows,
        "k": k,
        "wall_perdoc_loop_s": wall_loop,
        "wall_vectorized_s": wall_vec,
        "speedup": round(wall_loop / wall_vec, 2),
        "docs_per_sec_vectorized": round(n_docs / wall_vec, 0),
    }
    with open("bench_text_kernel.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
