"""Deduplication operators for the training-data pipeline.

Five flavors over a ``documents(id, text)``-shaped table, each scaled
for a 100 TB corpus (no driver-side loops, no per-row Python):

- **exact**        — sha256 content hash, groupBy, keep min id.
- **MinHash+LSH**  — char-shingle → H minhashes → bands → bucket join.
- **SimHash**      — per-bit majority over hashed shingles.
- **n-gram Jaccard** — exact Jaccard on candidate pairs (verification
  stage after LSH, or standalone with a cheap banding prefilter).
- **embedding cosine** — near-dup via cosine over an embedding column
  (delegates to :mod:`hoover_spark.operators.similarity`).

Scale notes (the part that matters at 1000 executors):

- Shingle explosion multiplies rows by ~|text|; the per-doc aggregate
  (minhash/simhash) is a partial+final hash agg, so the exploded rows
  combine **map-side** before any shuffle — the shuffle carries one
  signature row per (doc, hash_i), not per shingle.
- LSH bucket join is an equi-join on the band key; hot buckets (boiler-
  plate text) are bounded by ``max_bucket`` (drop pathological buckets,
  standard practice) and AQE skew splitting handles the rest.
- All hashing is explicit affine/polynomial arithmetic mod
  ``HASH_P`` (`hoover_spark.functions.text.HASH_P`) so the DuckDB
  oracle can recompute signatures bit-for-bit.
- Signature tables are ``localCheckpoint``-ed (each feeds ≥2 consumers;
  recompute would double the shingle scan). The checkpoint blocks are
  released by Spark's ContextCleaner once callers drop the returned
  DataFrames — long-lived sessions don't accumulate them beyond live
  references.

Reference note: the reference engine has no dedup (it is a graph
runtime); these operators are the corpus-pipeline capability layer the
north rule's 10^12-file corpus needs before any link analysis —
sha256-based exact dedup mirrors its per-row content sha256 invariant
(BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hoover_spark.functions.text import HASH_P, shingle_codes, tokens

# deterministic affine-hash coefficient schedules (public LCG constants).
MINHASH_A = 1_664_525
MINHASH_A2 = 22_695_477
MINHASH_B = 1_013_904_223


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for i in range(n_hashes); a_i odd, both < HASH_P."""
    out = []
    for i in range(n_hashes):
        a = (MINHASH_A * (i + 1) + MINHASH_B) % HASH_P | 1
        b = (MINHASH_A2 * (i + 1) + 12_345) % HASH_P
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, content_sha, canonical_id, is_duplicate) — exact content
    dedup via sha256; canonical = min id per hash group.

    One shuffle: the canonical table has one row per DISTINCT sha —
    near-corpus-cardinality when duplicates are rare — so the
    back-join is a plain shuffle join on the sha both sides are
    already hash-partitioned by (no second shuffle of the canon side;
    AQE upgrades to broadcast when the canon table is genuinely
    small)."""
    hashed = df.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("content_sha")
    )
    canon = hashed.groupBy("content_sha").agg(F.min("id").alias("canonical_id"))
    return (
        hashed.join(canon, on="content_sha")
        .select(
            "id",
            "content_sha",
            "canonical_id",
            (F.col("id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _check_unique_ids(df: DataFrame, id_col: str, caller: str) -> None:
    """Opt-in duplicate-id guard (``HOOVER_SPARK_CHECK_UNIQUE_IDS=1``):
    the fused signature kernels emit one signature row per INPUT ROW,
    so a non-unique id column yields duplicate, divergent signature
    rows (the pre-fusion groupBy('id') form merged them). The check is
    one extra aggregation job, so it is off by default — enable it in
    debug/CI runs on corpora whose id provenance is unverified."""
    import os

    if os.environ.get("HOOVER_SPARK_CHECK_UNIQUE_IDS") != "1":
        return
    dup = (
        df.groupBy(F.col(id_col)).agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"{caller}: id column {id_col!r} is not unique (e.g. "
            f"{dup[0][0]!r} appears {dup[0]['n']}x); signatures are "
            "per-row, so duplicate ids yield divergent signature rows"
        )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 12, k: int = 5
) -> DataFrame:
    """(id, h0..h{n-1}) — MinHash signature over character k-gram codes.

    Fused vectorized Arrow kernel (the north rule's mandated UDF
    style): per batch, every document's codepoint array is decoded
    once (utf-32 → one int per codepoint, Spark's length semantics),
    k-gram polynomial codes come from k shifted numpy passes, and all
    n minima are ``np.minimum.reduceat`` segmented reductions over the
    batch-concatenated code vector — C speed end to end, and the
    shingle rows NEVER cross the Arrow boundary (measured at 3.2M docs
    × 48 hashes: the exploded-row form moved ~1e9 rows through Arrow
    plus a 48-expression JVM agg, ~50 s at local[32]; fused: a few
    seconds). Arithmetic is exactly the expression form
    ``min(pmod(a*code + b, HASH_P))`` — all int64, bit-identical to
    the DuckDB oracle (hash-gate verified). PRECONDITION: ``id`` is
    unique per row (true for every corpus table here); duplicate ids
    would yield one signature per row rather than a merged shingle
    set. Set ``HOOVER_SPARK_CHECK_UNIQUE_IDS=1`` to enforce.
    """
    _check_unique_ids(df, id_col, "minhash_signatures")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hoover_spark.functions.text import code_segments

    coeffs = minhash_coeffs(n_hashes)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)
    schema = T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [T.StructField(f"h{i}", T.LongType(), True) for i in range(n_hashes)]
    )

    def run(batches):
        for pdf in batches:
            seg = code_segments(pdf, k)
            if seg is None:
                yield pd.DataFrame(
                    {"id": np.array([], dtype=np.int64)}
                    | {f"h{i}": np.array([], dtype=np.int64) for i in range(n_hashes)}
                )
                continue
            ids, cat, starts = seg
            data = {"id": ids}
            for idx in range(n_hashes):
                h = (A[idx] * cat + B[idx]) % HASH_P
                data[f"h{idx}"] = np.minimum.reduceat(h, starts)
            yield pd.DataFrame(data)

    return (
        df.where(F.length(text_col) >= k)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(run, schema=schema)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 12,
    band_size: int = 3,
    k: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate near-duplicate pairs (id_a < id_b):
    documents agreeing on *all* rows of at least one band.

    Bands are unpivoted to (id, band, key) rows (`stack`-style union of
    struct keys) and candidates come from a self-join on (band, key) —
    the classic banding bucket join. Buckets larger than ``max_bucket``
    are dropped (boilerplate guard; at web scale one viral page must
    not produce a quadratic bucket).

    PRECONDITION: ``id_col`` must be unique per row — signatures are
    per-row (see :func:`minhash_signatures`), so duplicate ids produce
    divergent signature rows and spurious/missed pairs with no runtime
    signal. Set ``HOOVER_SPARK_CHECK_UNIQUE_IDS=1`` to enforce."""
    assert n_hashes % band_size == 0
    # materialize the signature table once — every band branch and the
    # bucket-size filter re-reads it; without this the shingle explosion
    # + 12-way min agg re-runs per DAG branch (measured 5× wall at high
    # core counts where exchange reuse missed).
    sigs = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, k=k).localCheckpoint()
    n_bands = n_hashes // band_size
    band_rows = None
    for bnd in range(n_bands):
        cols = [F.col(f"h{bnd * band_size + j}") for j in range(band_size)]
        key = F.concat_ws(":", *[c.cast("string") for c in cols])
        row = sigs.select("id", F.lit(bnd).alias("band"), key.alias("key"))
        band_rows = row if band_rows is None else band_rows.unionByName(row)
    sizes = band_rows.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    ok = band_rows.join(
        sizes.where(F.col("n") <= max_bucket).select("band", "key"), on=["band", "key"]
    )
    a = ok.select("band", "key", F.col("id").alias("id_a"))
    b = ok.select("band", "key", F.col("id").alias("id_b"))
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify)
# ---------------------------------------------------------------------------

def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact word-n-gram Jaccard for given
    candidate pairs. |A∩B| via groupBy over exploded distinct shingles
    joined to the pair list; |A∪B| = |A|+|B|-|A∩B|.

    This is the verification stage after :func:`minhash_lsh_pairs`:
    the expensive exact computation runs only on LSH candidates, which
    is what keeps it sub-quadratic at corpus scale."""
    t = tokens(text_col)
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
                    ),
                )
            ).alias("gram"),
        )
        .where(F.size(t) >= n)
        .distinct()
        # referenced by counts + both join sides — materialize once
        .localCheckpoint()
    )
    counts = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col("id").alias("id_a"), "gram")
    gb = grams.select(F.col("id").alias("id_b"), "gram")
    inter = (
        pairs.join(ga, on="id_a")
        .join(gb, on=["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # Docs with fewer than n word tokens have no grams and therefore no
    # counts row; an inner join would silently drop their candidate
    # pairs (two identical 2-word docs share full minhash signatures
    # but would never be scored). Left-join the counts and resolve the
    # zero-gram/zero-gram case by exact content equality (sha256).
    #
    # Scale bound: the set of sub-n-token docs is UNBOUNDED at corpus
    # scale (billions of short strings), so it must never be broadcast.
    # Semi-join it down to ids that actually appear in a candidate pair
    # first — candidates are already sub-quadratic — then let the
    # planner pick the join (AQE upgrades to broadcast when the pruned
    # set really is small).
    pair_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    zero_docs = (
        df.where(F.size(t) < n)
        .select(
            F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("sha")
        )
        .join(pair_ids, on="id", how="left_semi")
    )
    inter0 = F.coalesce("n_inter", F.lit(0))
    na = F.coalesce("na", F.lit(0))
    nb = F.coalesce("nb", F.lit(0))
    return (
        pairs.join(inter, on=["id_a", "id_b"], how="left")
        .join(
            counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"),
            on="id_a", how="left",
        )
        .join(
            counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"),
            on="id_b", how="left",
        )
        .join(zero_docs.withColumnsRenamed({"id": "id_a", "sha": "sha_a"}), on="id_a", how="left")
        .join(zero_docs.withColumnsRenamed({"id": "id_b", "sha": "sha_b"}), on="id_b", how="left")
        .select(
            "id_a",
            "id_b",
            F.when(
                (na + nb) == 0,
                F.when(F.col("sha_a") == F.col("sha_b"), F.lit(1.0)).otherwise(F.lit(0.0)),
            )
            .otherwise(inter0 / (na + nb - inter0))
            .alias("jaccard"),
        )
    )


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 12,
    band_size: int = 3,
) -> DataFrame:
    """End-to-end near-dedup: LSH candidates → exact Jaccard verify →
    (id_a, id_b, jaccard) pairs above threshold."""
    cand = minhash_lsh_pairs(df, id_col, text_col, n_hashes=n_hashes, band_size=band_size)
    scored = ngram_jaccard(df, cand, id_col, text_col)
    return scored.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 16,
    k: int = 5,
    a: int = MINHASH_A,
    b: int = MINHASH_B,
) -> DataFrame:
    """(id, simhash) — ``n_bits``-bit SimHash over char k-gram codes.

    bit_j(doc) = [ sum over shingles of (±1 by bit j of the mixed
    hash) > 0 ]. Fused vectorized Arrow kernel (same skeleton as
    :func:`minhash_signatures`): the per-bit ±1 sums are
    ``np.add.reduceat`` segmented reductions over the
    batch-concatenated mixed-hash vector — no per-shingle rows cross
    the Arrow boundary. Arithmetic is exactly the expression form
    (``(a·code + b) mod HASH_P``, bit test, signed sum, pack) —
    hash-gate verified vs DuckDB. PRECONDITION: ``id`` unique per row
    (``HOOVER_SPARK_CHECK_UNIQUE_IDS=1`` enforces)."""
    _check_unique_ids(df, id_col, "simhash")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from hoover_spark.functions.text import code_segments

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            seg = code_segments(pdf, k)
            if seg is None:
                yield pd.DataFrame(
                    {
                        "id": np.array([], dtype=np.int64),
                        "simhash": np.array([], dtype=np.int64),
                    }
                )
                continue
            ids, cat, starts = seg
            mixed = (a * cat + b) % HASH_P
            packed = np.zeros(len(ids), dtype=np.int64)
            for j in range(n_bits):
                pm = np.where(((mixed >> j) & 1).astype(bool), 1, -1).astype(np.int64)
                s = np.add.reduceat(pm, starts)
                packed += np.where(s > 0, np.int64(1) << j, 0)
            yield pd.DataFrame({"id": ids, "simhash": packed})

    return (
        df.where(F.length(text_col) >= k)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(run, schema=schema)
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within ``max_hamming`` bits.

    Candidate generation by the standard block-split trick: split the
    signature into (max_hamming+1) blocks; any pair within distance d
    agrees on ≥1 block — equi-join per block, verify with bit_count.

    PRECONDITION: ``id_col`` must be unique per row — signatures are
    per-row (see :func:`simhash`), so duplicate ids produce divergent
    signature rows with no runtime signal. Set
    ``HOOVER_SPARK_CHECK_UNIQUE_IDS=1`` to enforce."""
    sigs = simhash(df, id_col, text_col, n_bits=n_bits).localCheckpoint()
    n_blocks = max_hamming + 1
    block_bits = n_bits // n_blocks
    rows = None
    for blk in range(n_blocks):
        key = F.shiftright(F.col("simhash"), blk * block_bits).bitwiseAND(
            F.lit((1 << block_bits) - 1)
        )
        r = sigs.select("id", "simhash", F.lit(blk).alias("blk"), key.alias("key"))
        rows = r if rows is None else rows.unionByName(r)
    a = rows.select("blk", "key", F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = rows.select("blk", "key", F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    cand = (
        a.join(b, on=["blk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# connected-component dedup clustering
# ---------------------------------------------------------------------------

def dup_clusters(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """(id, cluster_id) — group near-dup pairs into clusters with the
    engine's own WCC kernel (pairs are edges; cluster = min id of the
    component). This is where the dedup pipeline and the link-graph
    engine meet: dedup at corpus scale IS a connected-components
    problem."""
    from hoover_spark.operators.graph import Graph
    from hoover_spark.operators.wcc import wcc

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = wcc(Graph(edges, num_partitions=16))
    return (
        all_ids.join(labels.withColumnRenamed("vid", "id"), on="id", how="left")
        .select("id", F.coalesce("label", F.col("id")).alias("cluster_id"))
    )


# ---------------------------------------------------------------------------
# cross-document n-gram containment (sub-document dedup signal)
# ---------------------------------------------------------------------------

def dup_shingle_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 9
) -> DataFrame:
    """Per-document shared-n-gram fraction — the *sub-document* dedup
    signal (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): what fraction of a document's distinct
    character k-grams also occur in at least one OTHER document. Whole-
    document dedup (exact sha / MinHash) misses boilerplate and quoted
    spans; a high ``dup_fraction`` with a non-duplicate document is
    exactly that case, and corpus curation drops or trims on it.

    Returns ``(id, n_codes, dup_codes, dup_fraction)`` — one row per
    input document (documents shorter than ``k`` report 0/0/0.0).

    Plan (three bucketed shuffles, no iteration, no Python in the
    second half):

    1. ``shingle_codes`` — the fused Arrow kernel, O(|text|·k) per doc;
    2. distinct ``(id, code)`` — hash agg keyed on the pair;
    3. ``groupBy(code)`` doc-frequency — partial/final hash agg; the
       join back to (id, code) is an equi-join on code (AQE handles
       boilerplate-hot codes the way LSH handles hot buckets);
    4. ``groupBy(id)`` — final per-doc counts; one double division.

    The polynomial code space is ~255·31^(k−1) (``shingle_codes``
    reduces codepoints mod 256), so rare accidental collisions can
    only OVER-count sharing — the signal is conservative in the safe
    direction, same trade as every hash-based dedup stage here. Counts
    are exact int64 and the fraction is a single division, so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    sc = (
        shingle_codes(df, id_col, text_col, k=k)
        .select("id", "code")
        .distinct()
    )
    code_docs = sc.groupBy("code").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        sc.join(code_docs, on="code")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_codes"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
                "dup_codes"
            ),
        )
    )
    n = F.col("n_codes")
    return (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(per_doc, on="id", how="left")
        .select(
            "id",
            F.coalesce(n, F.lit(0)).cast("long").alias("n_codes"),
            F.coalesce("dup_codes", F.lit(0)).cast("long").alias("dup_codes"),
            F.when(
                F.coalesce(n, F.lit(0)) > 0,
                F.col("dup_codes").cast("double") / n.cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that share
    any character ``k``-gram with a held-out benchmark set (the
    standard n-gram-overlap decontamination of public LLM corpus
    pipelines; cf. the 13-gram rule popularized by GPT-3's appendix).

    Returns one row per ``train`` document:
    ``(id, n_codes, n_hits, contaminated)`` where ``n_codes`` is the
    document's distinct k-gram count, ``n_hits`` how many of those
    also occur in the benchmark, and ``contaminated = n_hits > 0``.

    Plan: both sides run the fused Arrow shingle kernel
    (:func:`hoover_spark.functions.text.shingle_codes`, O(|text|·k)
    per document), reduce to distinct codes, and meet in ONE equi-join
    on the 64-bit code. At 100 TB the benchmark side is tiny by
    construction (a benchmark is MBs, the corpus is TBs): its distinct
    code set broadcasts, making the whole pass map-side — no shuffle
    of the corpus. Collisions in the polynomial code space can only
    OVER-flag (safe direction for decontamination). ``k`` ≤ 12 keeps
    the un-modded polynomial inside int64 (255·31¹¹·31/30 < 2⁶³) so a
    SQL oracle reproduces the codes bit-for-bit.
    """
    t_codes = (
        shingle_codes(train, id_col, text_col, k=k).select("id", "code").distinct()
    )
    b_codes = (
        shingle_codes(benchmark, id_col, text_col, k=k)
        .select("code")
        .distinct()
    )
    hits = (
        t_codes.join(F.broadcast(b_codes), on="code", how="left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_doc = t_codes.groupBy("id").agg(F.count(F.lit(1)).alias("n_codes"))
    return (
        train.select(F.col(id_col).cast("long").alias("id"))
        .join(per_doc, on="id", how="left")
        .join(hits, on="id", how="left")
        .select(
            "id",
            F.coalesce("n_codes", F.lit(0)).cast("long").alias("n_codes"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
