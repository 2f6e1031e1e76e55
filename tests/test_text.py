"""Text-analysis functions vs pure-python recomputation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoover_spark.functions.text import (
    HASH_P,
    STOPWORDS,
    lang_id,
    quality_metrics,
    quality_score,
    shingle_codes,
    subword_count,
    token_count,
    winnow_fingerprints,
)

DOCS = [
    (0, "the quick brown fox"),
    (1, "a a a a a"),
    (2, "el la de que los y mas cosas"),
    (3, "der die und ist das haus"),
    (4, "xyzzy plugh"),
    (5, "one, two; three!"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def test_token_counts(spark, docs_df):
    rows = docs_df.select(
        "doc_id",
        token_count("text").alias("nt"),
        subword_count("text").alias("ns"),
    ).collect()
    d = dict(DOCS)
    for r in rows:
        toks = d[r["doc_id"]].split()
        assert r["nt"] == len(toks)
        assert r["ns"] == sum(-(-len(t) // 4) for t in toks)


def test_shingle_codes_match_python(spark, docs_df):
    rows = shingle_codes(docs_df.where("doc_id = 0"), "doc_id", "text", k=5).collect()
    text = DOCS[0][1]
    expected = {
        (p + 1, sum((ord(text[p + j]) % 256) * 31**j for j in range(5)))
        for p in range(len(text) - 4)
    }
    assert {(r["pos"], r["code"]) for r in rows} == expected


def test_shingle_codes_nonascii_bounded(spark):
    """Unicode code points are reduced mod 256 before the polynomial
    mix, so a·code in the affine hashes provably fits int64 even on
    multilingual text (code ≤ 255·Σ31^j ≈ 2.4e8 at k=5)."""
    text = "héllo wörld — 你好世界 こんにちは"
    df = spark.createDataFrame([(0, text)], schema="doc_id long, text string")
    rows = shingle_codes(df, "doc_id", "text", k=5).collect()
    assert rows
    bound = 255 * sum(31**j for j in range(5))
    expected = {
        (p + 1, sum((ord(text[p + j]) % 256) * 31**j for j in range(5)))
        for p in range(len(text) - 4)
    }
    assert {(r["pos"], r["code"]) for r in rows} == expected
    assert all(0 <= r["code"] <= bound for r in rows)


def test_quality_metrics(spark, docs_df):
    rows = {r["id"]: r for r in quality_metrics(docs_df, "doc_id", "text").collect()}
    t = dict(DOCS)
    for i, r in rows.items():
        toks = t[i].split()
        assert r["n_tokens"] == len(toks)
        stop = sum(1 for w in toks if w in STOPWORDS)
        assert r["stopword_ratio"] == pytest.approx(stop / len(toks))
        assert r["uniq_ratio"] == pytest.approx(len(set(toks)) / len(toks))
    # punctuation-bearing doc
    assert rows[5]["punct_ratio"] > 0
    assert rows[0]["punct_ratio"] == 0.0


def test_quality_score_bounds(spark, docs_df):
    rows = quality_score(quality_metrics(docs_df, "doc_id", "text")).collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
    by_id = {r["id"]: r["quality"] for r in rows}
    # repetitive single-token doc scores below the diverse doc
    assert by_id[1] < by_id[0]


def test_lang_id(spark, docs_df):
    rows = {r["id"]: r["pred_lang"] for r in lang_id(docs_df, "doc_id", "text").collect()}
    assert rows[0] == "en"
    assert rows[2] == "es"
    assert rows[3] == "de"
    assert rows[4] == "und"  # no markers at all


def test_winnow_fingerprints_match_python(spark, docs_df):
    k, w, a, b = 5, 4, 1_103_515_245, 12_345
    rows = winnow_fingerprints(
        docs_df.where("doc_id = 0"), "doc_id", "text", k=k, window=w
    ).collect()
    text = DOCS[0][1]
    hs = [
        (a * sum(ord(text[p + j]) * 31**j for j in range(k)) + b) % HASH_P
        for p in range(len(text) - k + 1)
    ]
    expected = {min(hs[i : i + w]) for i in range(len(hs))}
    assert {r["fp"] for r in rows} == expected


def test_winnow_is_subset_invariant(spark, docs_df):
    """Winnowing guarantee: shared substrings longer than k+w-1 share
    at least one fingerprint — check on two docs with a common span."""
    df = spark.createDataFrame(
        [
            (10, "prefix AAA common span of text here BBB"),
            (11, "zzz common span of text here qqq end"),
        ],
        schema="doc_id long, text string",
    )
    fps = winnow_fingerprints(df, "doc_id", "text").collect()
    a = {r["fp"] for r in fps if r["id"] == 10}
    b = {r["fp"] for r in fps if r["id"] == 11}
    assert a & b


def test_code_segments_vectorized_matches_perdoc_reference():
    """The round-5 batch-vectorized shingle kernel (one Arrow buffer
    decode + batch-wide polynomial passes + one window gather) must be
    bit-identical to the retained per-document reference loop on
    nulls, empties, too-short docs, multi-byte and astral-plane
    unicode, and single/empty batches."""
    import numpy as np
    import pandas as pd

    from hoover_spark.functions.text import _code_segments_perdoc, code_segments

    cases = [
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "text": [
                    "hello world",
                    "ab",  # shorter than every k
                    None,
                    "héllo wörld ✓ 𝄞𝄞𝄞 end",  # 2/3/4-byte utf-8
                    "",
                    "aaaaa",
                ],
            }
        ),
        pd.DataFrame({"id": [10], "text": ["exactly5"]}),
        pd.DataFrame({"id": [], "text": pd.Series([], dtype=object)}),
        pd.DataFrame({"id": [1, 2], "text": [None, "ab"]}),  # all invalid
        pd.DataFrame({"id": [7, 8], "text": ["𝄞" * 12, "ascii only text here"]}),
    ]
    for k in (3, 5, 8):
        for pdf in cases:
            got = code_segments(pdf, k)
            want = _code_segments_perdoc(pdf, k)
            if want is None:
                assert got is None
                continue
            for g, w, name in zip(got, want, ("ids", "cat", "starts")):
                assert np.array_equal(g, w), (k, name)


def test_pii_stats_counts(spark):
    """Emails and IPv4s counted as non-overlapping matches; \\b guards
    reject over-long dotted runs only at word boundaries."""
    from hoover_spark.functions.text import pii_stats

    rows = [
        (0, "mail me at a.b-c_d@example.co.uk or x@y.io thanks"),
        (1, "server 10.0.3.7 and 192.168.1.255 are up"),
        (2, "no pii here at all"),
        (3, "mixed: root@host.net from 127.0.0.1"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in pii_stats(df, "doc_id", "text").collect()}
    assert (got[0]["n_emails"], got[0]["n_ipv4"], got[0]["has_pii"]) == (2, 0, True)
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["has_pii"]) == (0, 2, True)
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["has_pii"]) == (0, 0, False)
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["has_pii"]) == (1, 1, True)
    assert got[4]["has_pii"] is False


def test_segment_repetition_metrics(spark):
    from hoover_spark.functions.text import segment_repetition

    rows = [
        (0, "alpha. beta. alpha.  gamma."),   # 4 segs, 3 distinct
        (1, "same. same. same."),             # 3 segs, 1 distinct
        (2, "one sentence no period"),        # 1 seg
        (3, ""),                              # empty -> all zeros
        (4, "..."),                           # only empties after trim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in segment_repetition(df, "doc_id", "text").collect()}
    assert (got[0]["n_segments"], got[0]["n_distinct"]) == (4, 3)
    assert got[0]["dup_fraction"] == pytest.approx(0.25)
    assert got[0]["mean_seg_chars"] == pytest.approx(4.75)  # (5+4+5+5)/4
    assert (got[1]["n_segments"], got[1]["n_distinct"]) == (3, 1)
    assert got[1]["dup_fraction"] == pytest.approx(2.0 / 3.0)
    assert (got[2]["n_segments"], got[2]["dup_fraction"]) == (1, 0.0)
    for d in (3, 4):
        assert (got[d]["n_segments"], got[d]["dup_fraction"]) == (0, 0.0)


def test_token_rarity_matches_oracle(spark):
    from collections import Counter

    from hoover_spark.functions.text import token_rarity

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zyzzyva qwerty"),
        (4, ""),
        (5, "   "),
        (6, "the the the"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["avg_freq"], r["rare_frac"])
        for r in token_rarity(df, "doc_id", "text", rare_max_freq=2).collect()
    }
    toks = {i: t.split() for i, t in rows}
    freq = Counter(w for ws in toks.values() for w in ws)
    want = {}
    for i, ws in toks.items():
        if not ws:
            want[i] = (0, 0.0, 0.0)
            continue
        want[i] = (
            len(ws),
            round(sum(freq[w] for w in ws) / len(ws), 6),
            round(sum(1 for w in ws if freq[w] <= 2) / len(ws), 6),
        )
    assert got == want
