"""End-to-end corpus curation: the composite quality → near-dedup →
language gate of a large-scale training-data pipeline, built entirely
from this engine's own operators.

This is the capstone composition the LLM-pipeline modules exist for
(reference analogue: the reference composes its primitives into apps
the same way, e.g. ``test/intrusion_detection.cpp`` building pattern
mining from the mailbox primitives — here the app is data curation):

    quality_score ∘ quality_metrics   per-row expressions, no shuffle
    lang_id                           per-row expressions, no shuffle
    minhash_lsh_pairs                 banded LSH — sub-quadratic
    dup_clusters (engine's own WCC)   near-dup clustering
    decision join                     id-partitioned, light columns

Scale shape: the only text-bearing work is the one LSH signature scan;
every join afterwards moves a handful of numeric/short-string columns
keyed by id. At 100 TB the shuffles are |corpus|-row but ~30-byte-row;
the quality/language features ride the same scan Spark already does
for the signatures (Catalyst collapses the shared ``documents`` scan
into one FileScan with column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hoover_spark.functions.text import lang_id, quality_metrics, quality_score
from hoover_spark.operators.dedup import dup_clusters, minhash_lsh_pairs


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.65,
    keep_langs: tuple[str, ...] = ("en",),
    n_hashes: int = 12,
    band_size: int = 3,
    k: int = 5,
    max_bucket: int = 64,
) -> DataFrame:
    """(id, quality, pred_lang, cluster_id, keep, drop_reason) — one
    row per document with the curation verdict.

    ``keep`` ⇔ quality ≥ ``min_quality`` AND the doc is its near-dup
    cluster's canonical (min-id) member AND ``pred_lang ∈ keep_langs``.
    ``drop_reason`` reports the first failing gate in the fixed order
    ``low_quality → near_duplicate → lang`` (deterministic, so the
    driver's value hash is stable). The quality predicate uses the
    6-dp-rounded score so the boundary decision is bit-identical to
    the SQL oracle's.
    """
    feats = quality_score(quality_metrics(docs, id_col, text_col)).select(
        "id", F.round("quality", 6).alias("quality")
    )
    langs = lang_id(docs, id_col, text_col)
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, n_hashes=n_hashes, band_size=band_size,
        k=k, max_bucket=max_bucket,
    )
    clusters = dup_clusters(pairs, docs.select(F.col(id_col).alias("id")))

    out = feats.join(langs, on="id").join(clusters, on="id")
    low_q = F.col("quality") < F.lit(min_quality)
    is_dup = F.col("id") != F.col("cluster_id")
    bad_lang = ~F.col("pred_lang").isin(*keep_langs)
    return out.select(
        "id",
        "quality",
        "pred_lang",
        "cluster_id",
        (~(low_q | is_dup | bad_lang)).alias("keep"),
        F.when(low_q, F.lit("low_quality"))
        .when(is_dup, F.lit("near_duplicate"))
        .when(bad_lang, F.lit("lang"))
        .alias("drop_reason"),
    )
