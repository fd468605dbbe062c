"""Numeric distribution-drift monitors: two-sample KS and PSI.

The numeric twin of the text-side corpus drift monitor
(text.vocab_divergence, E77): training pipelines need to know when a
feature's DISTRIBUTION moved between two snapshots (crawl N vs N+1,
train vs serve) before the shift poisons a model.

* :func:`ks_drift` — the exact two-sample Kolmogorov-Smirnov statistic
  ``D = max_v |F_a(v) - F_b(v)|``. Spark shape: per-distinct-value
  (n_a, n_b) counts via ONE map-side-combinable shuffle (the data
  never reaches the window), then a running-sum window over the
  VALUE-GRAIN rows only, then a 1-row max. The window's single
  reducer sees |distinct values| rows — fine for measures, ratings,
  prices; for a truly continuous high-cardinality column, quantize
  first or use :func:`psi_drift` (fully combinable).
* :func:`psi_drift` — Population Stability Index over FIXED bins:
  ``Σ (p_b - q_b) · ln(p_b / q_b)`` with add-count smoothing so empty
  bins are defined. Everything is one groupBy on the bin id — no
  window, no value-grain state, the 100 TB path. Industry reading:
  PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

Both are deterministic and exactly mirrored by the DuckDB oracles
(counts are integers; the float division/ln runs on identical exact
inputs in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact two-sample KS statistic between ``a`` and ``b``'s
    ``value_col`` distributions: 1 row ``(n_a, n_b, ks_stat)``.
    NULL values are excluded from both sides (they carry no position
    in a CDF)."""
    va = a.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    vb = b.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    tagged = va.withColumn("__a", F.lit(1)).withColumn(
        "__b", F.lit(0)
    ).unionByName(
        vb.withColumn("__a", F.lit(0)).withColumn("__b", F.lit(1))
    )
    per_value = tagged.groupBy("v").agg(
        F.sum("__a").alias("n_a"), F.sum("__b").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_value.select(
        F.sum("n_a").over(w).alias("c_a"),
        F.sum("n_b").over(w).alias("c_b"),
    )
    tot = per_value.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    return cum.join(F.broadcast(tot)).agg(
        F.max("t_a").cast("long").alias("n_a"),
        F.max("t_b").cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("c_a") / F.col("t_a")
                    - F.col("c_b") / F.col("t_b")
                )
            ),
            9,
        ).alias("ks_stat"),
    )


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index over ``bins`` equal-width bins on
    [lo, hi) (values outside clamp to the edge bins, the standard
    treatment): 1 row ``(n_a, n_b, psi)``. Laplace add-one bin
    smoothing keeps empty bins defined. Fully map-side-combinable —
    the 100 TB drift path."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / bins

    def binned(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        bin_id = F.least(
            F.greatest(
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        return (
            df.where(v.isNotNull())
            .groupBy(bin_id.alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{tag}"))
        )

    grid = (
        binned(a, "a")
        .join(binned(b, "b"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = grid.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    smoothed = grid.join(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        ((F.col("n_a") + 1) / (F.col("t_a") + F.lit(bins))).alias("p"),
        ((F.col("n_b") + 1) / (F.col("t_b") + F.lit(bins))).alias("q"),
    )
    return smoothed.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            9,
        ).alias("psi"),
    )


def mwu_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    z_threshold: float = 2.5758,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) drift test between ``a`` and
    ``b``'s ``value_col`` distributions — the rank-based member of the
    drift trio (KS = max CDF gap, PSI = binned mass shift, MWU = does
    one side STOCHASTICALLY DOMINATE): outliers can't move it (ranks
    saturate) and no binning choice exists. 1 row ``(n_a, n_b, u_a,
    z, drifted)`` with the normal approximation z = (U_a − n_a·n_b/2)
    / σ, σ² tie-corrected: σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))).

    Engine-exact by construction: average ranks are half-integers
    (c − (t−1)/2 off the cumulative count window) and all rank sums
    are dyadic rationals summed exactly in doubles (< 2^52), so U_a is
    EXACT — and the z expression is a fixed operand-order double both
    engines evaluate identically (sqrt is IEEE correctly-rounded).
    Per-distinct-value counts via one combinable shuffle (the raw
    stream never reaches the window, the ks_drift shape); the window
    sees value-grain rows only. Degenerate inputs (all values tied →
    σ = 0) emit NULL z and ``drifted = false``. NULLs excluded (no
    rank)."""
    va = a.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    vb = b.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    tagged = va.withColumn("__a", F.lit(1)).withColumn(
        "__b", F.lit(0)
    ).unionByName(
        vb.withColumn("__a", F.lit(0)).withColumn("__b", F.lit(1))
    )
    per_value = tagged.groupBy("v").agg(
        F.sum("__a").alias("n_a"), F.sum("__b").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_value.select(
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b")).alias("__t"),
        F.sum(F.col("n_a") + F.col("n_b")).over(w).alias("__c"),
    ).select(
        "n_a",
        "__t",
        (F.col("__c") - (F.col("__t") - F.lit(1)) / 2.0).alias("__avg"),
    )
    agg = ranked.agg(
        F.sum(F.col("n_a")).cast("long").alias("__ta"),
        F.sum(F.col("__t") - F.col("n_a")).cast("long").alias("__tb"),
        F.sum(F.col("n_a") * F.col("__avg")).alias("__ra"),
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).cast("long").alias("__ties"),
    )
    ta, tb = F.col("__ta"), F.col("__tb")
    n = ta + tb
    u_a = F.col("__ra") - ta.cast("double") * (ta + 1) / 2.0
    mu = ta.cast("double") * tb / 2.0
    var = (
        ta.cast("double") * tb / 12.0
    ) * ((n + 1) - F.col("__ties") / (n.cast("double") * (n - 1)))
    z = F.when(var > 0, (u_a - mu) / F.sqrt(var))
    return agg.select(
        ta.alias("n_a"),
        tb.alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("drifted"),
    )


def js_divergence(
    a: DataFrame,
    b: DataFrame,
    cat_col: str,
    categories: "list[str]",
) -> DataFrame:
    """E190: Jensen-Shannon divergence between two categorical mixes —
    the drift reading PSI can't give you for a CATEGORY column:
    symmetric, defined on zero cells without smoothing (0·ln 0 = 0),
    and bounded (÷ ln 2 → [0, 1]) so one threshold works for every
    column. Output: one row ``(n_a, n_b, jsd, jsd_norm)``.

    Fixed explicit category list (the Benford/entropy discipline): the
    per-side counts pivot into fixed columns and the divergence sums
    in one deterministic category order shared by both engines; rows
    outside the list (incl. NULL) are excluded from both mixes.

    Scale shape: one combinable 1-row aggregate per side, broadcast
    cross-join of the two 1-row frames — no shuffle beyond the folds.
    """
    import math

    if len(categories) < 2:
        raise ValueError("need >= 2 categories")
    if len(set(categories)) != len(categories):
        raise ValueError("categories must be distinct")

    def side(df: DataFrame, tag: str) -> DataFrame:
        c = F.col(cat_col)
        return df.agg(
            *[
                F.sum((c == cat).cast("long")).alias(f"__{tag}{i}")
                for i, cat in enumerate(categories)
            ]
        )

    g = side(a, "a").crossJoin(F.broadcast(side(b, "b")))
    na = sum(F.col(f"__a{i}") for i in range(len(categories)))
    nb = sum(F.col(f"__b{i}") for i in range(len(categories)))
    jsd = None
    for i in range(len(categories)):
        pa = F.col(f"__a{i}").cast("double") / na.cast("double")
        pb = F.col(f"__b{i}").cast("double") / nb.cast("double")
        m = (pa + pb) / F.lit(2.0)
        ta = F.when(
            F.col(f"__a{i}") > 0, F.lit(0.5) * pa * F.log(pa / m)
        ).otherwise(F.lit(0.0))
        tb = F.when(
            F.col(f"__b{i}") > 0, F.lit(0.5) * pb * F.log(pb / m)
        ).otherwise(F.lit(0.0))
        term = ta + tb
        jsd = term if jsd is None else jsd + term
    return g.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(jsd, 6).alias("jsd"),
        F.round(jsd / F.lit(math.log(2.0)), 6).alias("jsd_norm"),
    )
