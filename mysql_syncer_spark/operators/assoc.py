"""Association-rule mining (pairwise): support / confidence / lift
over (basket, item) data — the market-basket layer of the analytics
surface ("users who did X also did Y"), the co-occurrence statistics
behind recommendation shortlists and event-affinity dashboards.

Scope is deliberately the PAIRWISE level (the level practically every
production rules job runs at): frequent single items come from one
combinable groupBy, frequent pairs from a within-basket self-join of
the DEDUPLICATED (basket, item) list — work is Σ_b (items_b choose 2),
quadratic only inside a basket, never across baskets. The classic
skew risk is the mega-basket (one basket with 10⁵ items squares into
10¹⁰ pairs); ``max_items`` is that guard, the basket-level twin of the
dedup module's ``max_df`` shingle cap: baskets above the cap are
EXCLUDED from the pair universe (and from nothing else), a documented
semantic the SQL oracle mirrors exactly.

Metrics (N = number of baskets):
  support(X→Y)    = n(X,Y) / N
  confidence(X→Y) = n(X,Y) / n(X)
  lift(X→Y)       = n(X,Y)·N / (n(X)·n(Y))   (>1 ⇔ positive assoc)
Both rule directions are emitted (confidence is asymmetric). Counts
are exact integers; ratios are single IEEE divisions of integers, so
the DuckDB mirror is value-exact after the standard round-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def cooccurrence_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_items: int | None = None,
) -> DataFrame:
    """Pairwise association rules: ``(antecedent, consequent, n_pair,
    n_antecedent, n_consequent, n_baskets, support, confidence,
    lift)`` for every ordered pair co-occurring in ≥
    ``min_pair_count`` baskets. NULL baskets/items are excluded."""
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}"
        )
    if max_items is not None and max_items < 2:
        raise ValueError(f"max_items must be >= 2, got {max_items}")
    baskets = (
        df.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .distinct()
    )
    n_baskets = baskets.select("b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_n = baskets.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    pair_src = baskets
    if max_items is not None:
        w = Window.partitionBy("b")
        pair_src = (
            baskets.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_items)
            .drop("__bsz")
        )
    x = pair_src.select("b", F.col("i").alias("ia"))
    y = pair_src.select("b", F.col("i").alias("ib"))
    pairs = (
        x.join(y, "b")
        .where(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    out = (
        pairs.join(
            F.broadcast(item_n.select(F.col("i").alias("ia"),
                                      F.col("n_i").alias("n_antecedent"))),
            "ia",
        )
        .join(
            F.broadcast(item_n.select(F.col("i").alias("ib"),
                                      F.col("n_i").alias("n_consequent"))),
            "ib",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "n_pair",
        "n_antecedent",
        "n_consequent",
        "n_baskets",
        (F.col("n_pair") / F.col("n_baskets")).alias("support"),
        (F.col("n_pair") / F.col("n_antecedent")).alias("confidence"),
        (
            F.col("n_pair") * F.col("n_baskets")
            / (F.col("n_antecedent") * F.col("n_consequent"))
        ).alias("lift"),
    )
