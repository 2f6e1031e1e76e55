"""Count-min sketch + MIDAS scores vs exact python recomputation."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hoover_spark.operators.sketches import cms_build, cms_query, midas_scores


@pytest.fixture(scope="module")
def keyed_df(spark):
    # heavy-hitter distribution: key k appears k times, k in 1..30
    rows = [(f"k{k}",) for k in range(1, 31) for _ in range(k)]
    return spark.createDataFrame(rows, schema="key string")


def test_cms_overestimates_never_under(spark, keyed_df):
    sk = cms_build(keyed_df, "key", depth=4, width=64)
    keys = keyed_df.distinct()
    est = {r["key"]: r["est"] for r in cms_query(sk, keys, "key", depth=4, width=64).collect()}
    true = {f"k{k}": k for k in range(1, 31)}
    for k, t in true.items():
        assert est[k] >= t  # CMS never underestimates
    # with width 64 >> 30 keys, most estimates are exact
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact >= 25


def test_cms_total_mass(spark, keyed_df):
    sk = cms_build(keyed_df, "key", depth=4, width=64)
    per_row = {r["row"]: 0 for r in sk.collect()}
    for r in sk.collect():
        per_row[r["row"]] += r["cnt"]
    n = keyed_df.count()
    assert all(v == n for v in per_row.values())  # each row sees every item


def test_midas_scores_flag_burst(spark):
    """An edge quiet for 4 days then bursting on day 5 must out-score a
    steady edge; scores match the published formula recomputed in
    python."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    # steady edge (1,2): 5 events/day for 5 days
    for d in range(5):
        for _ in range(5):
            rows.append((1, 2, base + dt.timedelta(days=d)))
    # bursty edge (3,4): 1/day for 4 days, 50 on day 5
    for d in range(4):
        rows.append((3, 4, base + dt.timedelta(days=d)))
    for _ in range(50):
        rows.append((3, 4, base + dt.timedelta(days=4)))
    df = spark.createDataFrame(rows, schema="src long, dst long, ts timestamp")

    res = midas_scores(df, "src", "dst", "ts", window="1 day", width=4096).collect()
    day5 = {(r["src"], r["dst"]): r for r in res if r["t"] == 5}
    assert day5[(3, 4)]["score"] > day5[(1, 2)]["score"] * 10

    # formula check on the bursty edge: a=50, s=54, t=5
    r = day5[(3, 4)]
    assert (r["a"], r["s"], r["t"]) == (50, 54, 5)
    expected = (50 - 54 / 5) ** 2 * 25 / (54 * 4)
    assert r["score"] == pytest.approx(expected)


def test_midas_first_window_zero_score(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 2, base), (1, 2, base)], schema="src long, dst long, ts timestamp"
    )
    res = midas_scores(df, "src", "dst", "ts", window="1 day").collect()
    assert len(res) == 1 and res[0]["score"] == 0.0
