"""Co-occurrence lift vs an exact python oracle + lineitem sanity."""

import pytest

from hoover_spark.operators.cooccur import cooccurrence_lift

SF001 = "/root/testdata/sf0.001"


def _oracle(rows, min_pairs=2, max_basket=None):
    from collections import defaultdict

    items = defaultdict(set)  # basket -> set(items)
    for b, i in rows:
        items[b].add(i)
    n = len(items)
    c = defaultdict(int)
    for s in items.values():
        for i in s:
            c[i] += 1
    cab = defaultdict(int)
    for s in items.values():
        if max_basket is not None and len(s) > max_basket:
            continue
        ss = sorted(s)
        for x in range(len(ss)):
            for y in range(x + 1, len(ss)):
                cab[(ss[x], ss[y])] += 1
    out = {}
    for (a, b), cnt in cab.items():
        if cnt >= min_pairs:
            out[(a, b)] = (cnt, round(n * cnt / (c[a] * c[b]), 6))
    return out


FIX = [
    (1, "milk"), (1, "bread"), (1, "eggs"),
    (2, "milk"), (2, "bread"),
    (3, "milk"), (3, "bread"), (3, "beer"),
    (4, "beer"), (4, "eggs"),
    (5, "milk"),
    (5, "milk"),  # duplicate (basket, item) row must collapse
]


def test_lift_matches_oracle(spark):
    df = spark.createDataFrame(FIX, schema="b long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_pairs"], r["lift"])
        for r in cooccurrence_lift(df, "b", "item", min_pairs=2).collect()
    }
    assert got == _oracle(FIX, min_pairs=2)
    # known value: milk+bread in 3 of 5 baskets, c_milk=4, c_bread=3
    assert got[("bread", "milk")] == (3, round(5 * 3 / (4 * 3), 6))


def test_min_pairs_filters(spark):
    df = spark.createDataFrame(FIX, schema="b long, item string")
    got = {
        (r["item_a"], r["item_b"])
        for r in cooccurrence_lift(df, "b", "item", min_pairs=1).collect()
    }
    assert ("beer", "eggs") in got  # appears once, only at min_pairs=1
    assert got == set(_oracle(FIX, min_pairs=1))


def test_max_basket_cap(spark):
    rows = FIX + [(9, f"item{i}") for i in range(10)]
    df = spark.createDataFrame(rows, schema="b long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_pairs"], r["lift"])
        for r in cooccurrence_lift(
            df, "b", "item", min_pairs=1, max_basket_size=5
        ).collect()
    }
    want = _oracle(rows, min_pairs=1, max_basket=5)
    assert got == want
    assert not any(a.startswith("item") for a, _ in got)  # mega-basket dropped
    # but the mega-basket still counts toward n (lift denominator-side)
    assert got[("bread", "milk")][1] == round(6 * 3 / (4 * 3), 6)


def test_lineitem_baskets(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    out = cooccurrence_lift(li, "l_orderkey", "l_partkey", min_pairs=2)
    rows = out.collect()
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert r["n_pairs"] >= 2
        assert r["lift"] > 0
