"""True Structured-Streaming windowed aggregation with watermark.

Closes the reference's windowed-count semantics (SURVEY.md §2.8: MIDAS
``recent_n_ms`` sketch rotation = tumbling windows; late updates beyond
the retention horizon are dropped) with the native Spark mechanism:
``readStream → withWatermark → window() groupBy → append sink``.

The batch-side MIDAS/event plans (:mod:`hoover_spark.operators.sketches`)
stay the oracle-checkable surface; this module is the long-lived
cluster deployment shape — state-store-backed, late-data-dropping,
exactly-once to the file sink. The watermark plays the role of the
reference's fixed-size sketch rotation: events older than the horizon
can no longer perturb a finalized window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def run_windowed_counts(
    spark: SparkSession,
    drops_dir: str,
    work_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Consume event-drop parquet files as micro-batches; emit
    FINALIZED tumbling-window counts (append mode: a window row is
    written only once its window end falls behind the watermark, and
    late rows older than the watermark are dropped before aggregation).

    Returns the finalized (window_start, key, n) DataFrame read back
    from the sink."""
    out_dir = os.path.join(work_dir, "out")
    ck_dir = os.path.join(work_dir, "ck")
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
