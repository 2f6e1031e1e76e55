"""Dedup operators vs independent pure-python oracles.

Strategy (SURVEY.md §5): tiny deterministic corpora with hand-checkable
or brute-force-recomputable answers; the Spark result must match the
python recomputation exactly (signatures are integer arithmetic — no
tolerance needed)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hoover_spark.functions.text import HASH_P
from hoover_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_coeffs,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dedup_minhash,
    ngram_jaccard,
    simhash,
    simhash_near_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    (3, "completely different content with zero overlap here"),
    (4, "the quick brown fox jumps over the lazy dog today"),  # near dup
    (5, "another unrelated document about spark engines"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


# ---------------------------------------------------------------------------
# python oracles
# ---------------------------------------------------------------------------

def py_shingles(text: str, k: int = 5) -> set[int]:
    return {
        sum((ord(text[p + j]) % 256) * 31**j for j in range(k))
        for p in range(len(text) - k + 1)
    }


def py_minhash(text: str, n_hashes: int = 12, k: int = 5) -> list[int]:
    codes = py_shingles(text, k)
    return [
        min((a * c + b) % HASH_P for c in codes)
        for a, b in minhash_coeffs(n_hashes)
    ]


def py_word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = py_word_ngrams(a, n), py_word_ngrams(b, n)
    return len(sa & sb) / len(sa | sb)


def py_simhash(text: str, n_bits: int = 16, k: int = 5) -> int:
    codes = py_shingles(text, k)  # set — matches distinct-free agg? no:
    # spark aggregates over ALL shingle rows (multiset), so recompute
    # over positions, not the set
    codes = [
        sum(ord(text[p + j]) * 31**j for j in range(k))
        for p in range(len(text) - k + 1)
    ]
    a, b = 1_664_525, 1_013_904_223
    out = 0
    for j in range(n_bits):
        s = sum(1 if ((a * c + b) % HASH_P) >> j & 1 else -1 for c in codes)
        if s > 0:
            out |= 1 << j
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_exact_dedup(spark, docs_df):
    res = {r["id"]: r for r in exact_dedup(docs_df, "doc_id", "text").collect()}
    assert res[1]["is_duplicate"] and res[1]["canonical_id"] == 0
    assert not res[0]["is_duplicate"]
    for i in (2, 3, 4, 5):
        assert not res[i]["is_duplicate"]
    # sha matches hashlib
    assert res[0]["content_sha"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()


def test_minhash_signatures_match_python(spark, docs_df):
    rows = minhash_signatures(docs_df, "doc_id", "text").collect()
    for r in rows:
        expected = py_minhash(dict(DOCS)[r["id"]])
        got = [r[f"h{i}"] for i in range(12)]
        assert got == expected, r["id"]


def test_minhash_identical_docs_collide(spark, docs_df):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs_df, "doc_id", "text").collect()
    }
    assert (0, 1) in pairs  # identical docs always share every band
    # near-dups 0-2, 0-4 share most shingles — with 4 bands of 3 they
    # should collide too on this fixture
    assert (0, 2) in pairs and (0, 4) in pairs
    # disjoint docs must not pair
    assert (3, 5) not in pairs


def test_ngram_jaccard_matches_python(spark, docs_df):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 4), (3, 5)], schema="id_a long, id_b long"
    )
    res = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(docs_df, pairs, "doc_id", "text").collect()
    }
    d = dict(DOCS)
    for (a, b), j in res.items():
        assert j == pytest.approx(py_jaccard(d[a], d[b]), abs=1e-12)
    assert res[(0, 1)] == 1.0
    assert res[(3, 5)] == 0.0


def test_near_dedup_end_to_end(spark, docs_df):
    kept = near_dedup_minhash(docs_df, "doc_id", "text", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in kept}
    assert (0, 1) in got
    assert all(r["jaccard"] >= 0.5 for r in kept)


def test_simhash_matches_python(spark, docs_df):
    rows = simhash(docs_df, "doc_id", "text").collect()
    d = dict(DOCS)
    for r in rows:
        assert r["simhash"] == py_simhash(d[r["id"]]), r["id"]


def test_simhash_near_pairs(spark, docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs_df, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical → distance 0
    # brute-force check: every reported distance is the true distance
    d = dict(DOCS)
    for (a, b), h in pairs.items():
        assert bin(py_simhash(d[a]) ^ py_simhash(d[b])).count("1") == h


def test_dup_clusters_via_wcc(spark, docs_df):
    pairs = spark.createDataFrame([(0, 1), (1, 2)], schema="id_a long, id_b long")
    ids = docs_df.select(F.col("doc_id").alias("id"))
    res = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs, ids).collect()}
    assert res[0] == res[1] == res[2] == 0
    assert res[3] == 3 and res[4] == 4 and res[5] == 5


def test_ngram_jaccard_short_doc_heavy_corpus(spark):
    """Corpus where sub-n-token docs OUTNUMBER long ones (the 100 TB
    shape: billions of short strings). The zero-gram side must be
    pruned to candidate-pair ids — never broadcast wholesale — and the
    scored values must match brute force."""
    short = [(i, f"tok{i % 7} x") for i in range(200)]          # 2 tokens < n=3
    longd = [(1000 + i, f"alpha beta gamma delta {i}") for i in range(20)]
    df = spark.createDataFrame(short + longd, schema="doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 7), (0, 1), (3, 10), (1000, 1001), (5, 1000)],
        schema="id_a long, id_b long",
    )
    res = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(df, pairs, "doc_id", "text").collect()
    }
    d = dict(short + longd)
    assert res[(0, 7)] == 1.0          # identical short docs
    assert res[(0, 1)] == 0.0          # different short docs
    assert res[(3, 10)] == 1.0         # identical short docs (mod-7 twins)
    assert res[(1000, 1001)] == pytest.approx(
        py_jaccard(d[1000], d[1001]), abs=1e-12
    )
    assert res[(5, 1000)] == 0.0       # short vs long: no shared grams


def test_duplicate_id_guard_env_flag(spark, monkeypatch):
    """The fused kernels emit one signature row per INPUT ROW, so a
    non-unique id column silently diverges from the pre-fusion
    merged-shingle-set semantics. HOOVER_SPARK_CHECK_UNIQUE_IDS=1 must
    surface that as a hard error; unset, the documented per-row
    precondition applies and no extra job runs."""
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (1, "totally different text here"),
         (2, "unique row content")],
        schema="doc_id long, text string",
    )
    monkeypatch.setenv("HOOVER_SPARK_CHECK_UNIQUE_IDS", "1")
    with pytest.raises(ValueError, match="not unique"):
        minhash_signatures(dup, "doc_id", "text").collect()
    with pytest.raises(ValueError, match="not unique"):
        simhash(dup, "doc_id", "text").collect()
    # unique ids pass the guard
    uniq = dup.groupBy("doc_id").agg(F.first("text").alias("text"))
    assert minhash_signatures(uniq, "doc_id", "text").count() == 2
    monkeypatch.delenv("HOOVER_SPARK_CHECK_UNIQUE_IDS")
    # guard off: per-row semantics, one signature row per input row
    assert minhash_signatures(dup, "doc_id", "text").count() == 3


def test_decontaminate_flags_shared_grams(spark):
    """A train doc sharing a 12-gram span with the benchmark is
    flagged; disjoint docs are not; short docs report 0/0."""
    from hoover_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret benchmark passage lives here")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "quoting the secret benchmark passage verbatim"),  # overlaps
            (2, "completely unrelated words only zzz"),            # disjoint
            (3, "tiny"),                                           # < k chars
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in decontaminate(train, bench, "doc_id", "text", k=12).collect()}
    assert got[1]["contaminated"] is True and got[1]["n_hits"] > 0
    assert got[2]["contaminated"] is False and got[2]["n_hits"] == 0
    assert got[3]["n_codes"] == 0 and got[3]["contaminated"] is False
    # every train row present exactly once
    assert set(got) == {1, 2, 3}


def test_decontaminate_counts_vs_python(spark):
    """n_hits == |distinct train k-grams ∩ benchmark k-grams| computed
    in pure python over the same mod-256 polynomial codes."""
    from hoover_spark.operators.dedup import decontaminate

    k = 12
    b_text = "abcdefghijklmnop"
    t_text = "xxxabcdefghijklmnopyyy"

    def codes(s):
        cps = [ord(c) % 256 for c in s]
        return {
            sum(cps[i + j] * 31**j for j in range(k))
            for i in range(len(cps) - k + 1)
        }

    want = len(codes(t_text) & codes(b_text))
    bench = spark.createDataFrame([(9, b_text)], "doc_id long, text string")
    train = spark.createDataFrame([(1, t_text)], "doc_id long, text string")
    row = decontaminate(train, bench, "doc_id", "text", k=k).collect()[0]
    assert row["n_hits"] == want
    assert row["n_codes"] == len(codes(t_text))
