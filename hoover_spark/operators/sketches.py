"""Count-min sketch + MIDAS-style streaming edge-anomaly scores.

Reference semantics: ``test/count_min_sketch.cpp`` (CMS with d hash
rows × w buckets) and ``test/midas.cpp:29-36`` — three sketches
(`recent` per time window, `everything` cumulative) whose divergence
scores each edge occurrence; the published MIDAS score is
``(a - s/t)^2 * t^2 / (s * (t - 1))`` for current-window count ``a``,
cumulative count ``s``, window index ``t``.

Spark-first: a CMS over a DataFrame is just ``groupBy(row, bucket)``
counts — d rows × w buckets rows, tiny regardless of input size, and
buildable map-side (partial agg) in one shuffle. Queries join the keys
against the sketch and take the min over rows. This gives the *exact*
CMS estimate (same collisions as the reference's array), not an
approximation of it — bucket arithmetic is plain xxhash64 mod w.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: affine-bucket coefficients (LCG constants; SQL-replicable for
#: numeric keys — used when an external oracle must recompute buckets).
AFFINE_P = 1_000_000_007


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _window_seconds(window: str) -> int:
    """'1 day' / '30 minutes' → seconds (tumbling-window tick length)."""
    n, unit = window.strip().split()
    return int(n) * _UNIT_SECONDS[unit.lower()]


def _bucket(key_col, row: int, width: int, affine: bool = False):
    if affine:
        a = (1_664_525 * (row + 1) + 1_013_904_223) % AFFINE_P | 1
        b = (22_695_477 * (row + 1) + 12_345) % AFFINE_P
        return F.pmod(F.pmod(F.lit(a) * key_col + F.lit(b), F.lit(AFFINE_P)), F.lit(width))
    return F.pmod(F.xxhash64(key_col, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame, key: str, depth: int = 4, width: int = 256, affine: bool = False
) -> DataFrame:
    """(row, bucket, cnt) — count-min sketch of the key column.

    One union of d bucket projections → one groupBy; output is
    d×width rows max (broadcastable). ``affine=True`` uses the
    SQL-replicable affine bucket (numeric keys only)."""
    rows = None
    for r in range(depth):
        p = df.select(
            F.lit(r).alias("row"), _bucket(F.col(key), r, width, affine).alias("bucket")
        )
        rows = p if rows is None else rows.unionByName(p)
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 256,
    affine: bool = False,
) -> DataFrame:
    """(key, est) — CMS point estimate: min over rows of the bucket
    count. The sketch side is broadcast."""
    probes = None
    for r in range(depth):
        p = keys.select(
            F.col(key), F.lit(r).alias("row"), _bucket(F.col(key), r, width, affine).alias("bucket")
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def midas_scores(
    events: DataFrame,
    src: str,
    dst: str,
    ts: str,
    window: str = "1 day",
    depth: int = 4,
    width: int | None = 1024,
) -> DataFrame:
    """(src, dst, window_start, a, s, t, score) — MIDAS anomaly score
    per (edge, window): a = count in the window, s = cumulative count
    up to and including the window, t = 1-based window index.

    ``width=None`` counts exactly per edge key (the semantics the CMS
    approximates — SQL-replicable); otherwise counts go through the
    d×w CMS, matching the reference's bounded-memory sketch
    (``test/midas.cpp:29-36``). The chi-squared score is the published
    MIDAS formula. Everything is two windowed aggregations + one
    cumulative window function — no state store needed for the batch
    flavor; streaming uses the same plan inside ``foreachBatch``."""
    from pyspark.sql import Window as W

    key = F.concat_ws("→", F.col(src).cast("string"), F.col(dst).cast("string"))
    if width is None:
        # exact mode: the "bucket" is the key itself, one row
        bucketed = events.select(
            F.col(src),
            F.col(dst),
            F.window(F.col(ts), window).getField("start").alias("window_start"),
            F.lit(0).alias("row"),
            key.alias("bucket"),
        )
    else:
        bucketed = None
        for r in range(depth):
            p = events.select(
                F.col(src),
                F.col(dst),
                F.window(F.col(ts), window).getField("start").alias("window_start"),
                F.lit(r).alias("row"),
                _bucket(key, r, width).alias("bucket"),
            )
            bucketed = p if bucketed is None else bucketed.unionByName(p)

    per_window = bucketed.groupBy("row", "bucket", "window_start").agg(
        F.count(F.lit(1)).alias("wcnt")
    )
    cum = per_window.withColumn(
        "ccnt",
        F.sum("wcnt").over(
            W.partitionBy("row", "bucket").orderBy("window_start")
        ),
    )

    edges = bucketed.select(src, dst, "window_start", "row", "bucket").distinct()
    est = (
        edges.join(cum, on=["row", "bucket", "window_start"])
        .groupBy(src, dst, "window_start")
        .agg(F.min("wcnt").alias("a"), F.min("ccnt").alias("s"))
    )
    # window index t: elapsed ticks since the first observed window —
    # the reference MIDAS tick advances every window whether or not it
    # saw events (``test/midas.cpp``), so empty windows must NOT be
    # collapsed (a dense_rank over observed windows would do that).
    # One tiny min() agg broadcast back; no global window sort.
    dur_s = _window_seconds(window)
    first = est.agg(F.min("window_start").alias("w0"))
    scored = est.join(F.broadcast(first)).withColumn(
        "t",
        (
            (F.unix_timestamp("window_start") - F.unix_timestamp("w0"))
            / F.lit(dur_s)
        ).cast("long")
        + F.lit(1),
    ).drop("w0")
    return scored.withColumn(
        "score",
        F.when(
            (F.col("t") > 1) & (F.col("s") > 0),
            F.pow(F.col("a") - F.col("s") / F.col("t"), 2)
            * F.col("t") * F.col("t")
            / (F.col("s") * (F.col("t") - 1)),
        ).otherwise(F.lit(0.0)),
    )
