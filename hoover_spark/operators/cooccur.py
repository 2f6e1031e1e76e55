"""Market-basket co-occurrence with exact lift.

Beyond-reference pipeline/link operator: project a bipartite
(basket, item) relation onto item–item pairs and score association by
lift — the rational-arithmetic cousin of PMI (PMI = log(lift), left
un-logged so the DuckDB twin is hash-exact):

    lift(a, b) = P(a, b) / (P(a)·P(b)) = n·c_ab / (c_a·c_b)

with n = #baskets, c_x = #baskets containing x, c_ab = #baskets
containing both. Everything up to the final division is int64-exact.

Scale shape: the pair generation is a per-basket self-join — the join
key is the basket id, so the work is Σ_b |b|² bounded by the LARGEST
BASKET, not by item popularity (hot items cost nothing here; they only
widen the c_x table). At web scale the one guard that matters is a cap
on pathological mega-baskets (``max_basket_size`` — same discipline as
the LSH hot-bucket cap and GBAD's degree cap); capped baskets are
dropped from pair generation, exactly like an LSH bucket overflow.
Int64 bound: n·c_ab < 2⁶³ holds to n ≈ 3e9 baskets; past that cast the
numerator to double before dividing (≤1 ulp, under the 6 dp contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_lift(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Item–item co-occurrence counts and lift over a (basket, item)
    relation. Returns ``(item_a, item_b, n_pairs, lift)`` with
    ``item_a < item_b`` and ``n_pairs >= min_pairs``.

    Duplicate (basket, item) rows are collapsed first (set semantics:
    a basket supports a pair at most once). ``max_basket_size`` drops
    baskets with more items from pair generation (see module
    docstring); they still count toward n and the per-item counts.
    """
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    n1 = bi.select("b").distinct().agg(F.count(F.lit(1)).alias("n"))
    ic = bi.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    pi = bi
    if max_basket_size is not None:
        sizes = bi.groupBy("b").agg(F.count(F.lit(1)).alias("bsz"))
        pi = bi.join(
            sizes.where(F.col("bsz") <= max_basket_size).select("b"), on="b"
        )
    a = pi.select("b", F.col("item").alias("item_a"))
    bb = pi.select("b", F.col("item").alias("item_b"))
    pairs = (
        a.join(bb, on="b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= F.lit(min_pairs))
    )
    return (
        pairs.join(ic.select(F.col("item").alias("item_a"), F.col("c").alias("ca")), on="item_a")
        .join(ic.select(F.col("item").alias("item_b"), F.col("c").alias("cb")), on="item_b")
        .crossJoin(F.broadcast(n1))
        .select(
            "item_a",
            "item_b",
            "n_pairs",
            F.round(
                (F.col("n") * F.col("n_pairs")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
