"""withWatermark streaming semantics: late rows beyond the watermark
are dropped; windows finalize exactly once (SURVEY §2.8 watermark row)."""

from __future__ import annotations

import datetime as dt
import os
import time

from hoover_spark.streaming.windows import run_windowed_counts


def _drop(spark, drops_dir, name, rows, mtime):
    """Write one micro-batch parquet drop with a controlled mtime so
    availableNow processes drops in order."""
    stage = drops_dir + f".stage_{name}"
    df = spark.createDataFrame(
        rows,
        schema="event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(drops_dir, exist_ok=True)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            dest = os.path.join(drops_dir, f"{name}.parquet")
            os.rename(os.path.join(stage, f), dest)
            os.utime(dest, (mtime, mtime))


def ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m, 0)


def test_late_rows_dropped_and_windows_finalize_once(spark, tmp_path):
    drops = os.path.join(tmp_path, "drops")
    base = time.time() - 1000

    # drop 0: three 'a' events in the 10:00 window, one in 11:00
    _drop(spark, drops, "d0", [
        (1, 1, "a", ts(10, 5), 1.0),
        (2, 1, "a", ts(10, 20), 1.0),
        (3, 2, "a", ts(10, 40), 1.0),
        (4, 2, "a", ts(11, 10), 1.0),
    ], base + 0)
    # drop 1: event far ahead -> watermark advances to 15:00 - 30min,
    # finalizing the 10:00 and 11:00 windows
    _drop(spark, drops, "d1", [(5, 3, "a", ts(15, 0), 1.0)], base + 10)
    # drop 1b: the watermark derived from drop 1 takes effect with one
    # micro-batch of delay (global watermark updates at batch
    # boundaries); this spacer batch lets 14:30 become current
    _drop(spark, drops, "d1b", [(8, 3, "a", ts(15, 5), 1.0)], base + 20)
    # drop 2: a LATE row for the (already finalized) 10:00 window plus
    # an on-time row; the late row must be dropped, not re-counted
    _drop(spark, drops, "d2", [
        (6, 4, "a", ts(10, 30), 1.0),
        (7, 4, "a", ts(16, 0), 1.0),
    ], base + 30)

    out = run_windowed_counts(
        spark, drops, os.path.join(tmp_path, "work"),
        window="1 hour", watermark="30 minutes", key="event_type",
    )
    rows = {(r["window_start"], r["event_type"]): r["n"] for r in out.collect()}

    # finalized 10:00 window holds exactly the 3 on-time rows — the
    # late event 6 was beyond the watermark and was dropped
    assert rows[(ts(10), "a")] == 3
    assert rows[(ts(11), "a")] == 1
    # each finalized window appears exactly once (append semantics)
    assert len(rows) == len(set(rows))
    # windows not yet behind the watermark (15:00, 16:00) are absent
    assert (ts(16), "a") not in rows
