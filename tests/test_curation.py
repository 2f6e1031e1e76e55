"""Composite corpus-curation gate: per-document keep/drop verdicts."""

from __future__ import annotations

from hoover_spark.operators.curation import curate_corpus

# doc 0/1: identical high-quality English text (near-dup cluster; 0 is
# canonical). doc 2: distinct high-quality English. doc 3: Spanish.
# doc 4: degenerate repetition (low uniq_ratio + few tokens → low
# quality). Texts are long enough that 5-gram minhash is meaningful.
GOOD = "the quick brown fox jumps over the lazy dog and runs far away home"
DOCS = [
    (0, GOOD),
    (1, GOOD),
    (2, "a completely different english document about the weather and the sea today"),
    (3, "el la de que los y entonces el perro corre por la calle"),
    (4, "spam spam spam spam"),
]


def test_curation_verdicts(spark):
    docs = spark.createDataFrame(DOCS, schema="doc_id long, text string")
    out = {
        r["id"]: r
        for r in curate_corpus(
            docs, "doc_id", "text", min_quality=0.4, keep_langs=("en",)
        ).collect()
    }
    assert len(out) == 5
    assert out[0]["keep"] and out[0]["drop_reason"] is None
    # doc 1 is the non-canonical member of the {0,1} near-dup cluster
    assert out[1]["cluster_id"] == 0
    assert not out[1]["keep"] and out[1]["drop_reason"] == "near_duplicate"
    assert out[2]["keep"] and out[2]["cluster_id"] == 2
    assert not out[3]["keep"] and out[3]["drop_reason"] == "lang"
    assert out[3]["pred_lang"] == "es"
    assert not out[4]["keep"] and out[4]["drop_reason"] == "low_quality"


def test_curation_reason_priority(spark):
    """A low-quality duplicate reports low_quality (fixed gate order)."""
    docs = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam"), (1, "spam spam spam spam spam spam")],
        schema="doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in curate_corpus(
            docs, "doc_id", "text", min_quality=0.9, keep_langs=("en",)
        ).collect()
    }
    assert out[1]["cluster_id"] == 0
    assert out[1]["drop_reason"] == "low_quality"
