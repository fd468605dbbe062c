"""Statistical analytics: correlation matrices and per-group linear
trends — the exploratory-stats layer (feature redundancy screens,
metric co-movement dashboards, drift slopes) over series the engine
already materializes.

Everything here is CLOSED-FORM COMBINABLE aggregation — Pearson's r
and OLS slope/intercept/R² are all functions of the monoid sums (n,
Σx, Σy, Σxy, Σx², Σy²), which Spark exposes directly as map-side-
combinable aggregates (``corr``, ``regr_slope``, ``regr_intercept``,
``regr_r2``). One shuffle per query, K²-sized outputs, no iteration:
the correct at-scale shape for any series count K ≪ rows.

Cross-engine note: the sums accumulate in different orders on the two
engines, so final doubles differ in the last ulps — surfaced values
round to 6 decimals (the repo's standing float discipline).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin


def correlation_matrix(
    df: DataFrame, value_cols: list[str], min_rows: int = 2
) -> DataFrame:
    """Pearson correlation for every unordered pair of ``value_cols``
    in ONE aggregation pass: ``(col_a, col_b, corr, n)`` with
    col_a < col_b. ``n`` counts rows where BOTH columns are non-NULL
    (the pairwise-complete convention; ``corr`` ignores NULL pairs the
    same way). Pairs observed on fewer than ``min_rows`` complete rows
    return NULL corr (undefined), not a number."""
    if len(value_cols) < 2:
        raise ValueError("need at least two value columns")
    # Alias cells by pair INDEX, not by concatenated names: pairs
    # ('a','b_x') and ('a_b','x') would both alias __c_a_b_x.
    aggs = []
    for i, (a, b) in enumerate(combinations(value_cols, 2)):
        aggs.append(F.corr(a, b).alias(f"__c_{i}"))
        aggs.append(
            F.count(
                F.when(
                    F.col(a).isNotNull() & F.col(b).isNotNull(), F.lit(1)
                )
            ).alias(f"__n_{i}")
        )
    row = df.agg(*aggs)
    pairs = None
    for i, (a, b) in enumerate(combinations(value_cols, 2)):
        cell = row.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.when(
                F.col(f"__n_{i}") >= min_rows, F.col(f"__c_{i}")
            ).alias("corr"),
            F.col(f"__n_{i}").alias("n"),
        )
        pairs = cell if pairs is None else pairs.unionByName(cell)
    return pairs


def group_trends(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend of ``y_col`` against ``x_col``:
    ``(group..., slope, intercept, r2, n)`` via the closed-form
    regression aggregates — one combinable shuffle on the group key,
    the drift-slope monitor for any metric series. Groups whose x has
    zero variance return NULL slope (vertical fit is undefined)."""
    pair_ok = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    return df.groupBy(*group_cols).agg(
        F.regr_slope(y_col, x_col).alias("slope"),
        F.regr_intercept(y_col, x_col).alias("intercept"),
        F.regr_r2(y_col, x_col).alias("r2"),
        F.count(F.when(pair_ok, F.lit(1))).alias("n"),
    )


def group_median_disc(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str
) -> DataFrame:
    """Exact DISCRETE per-group median: the value at 1-indexed sorted
    position ``ceil(n/2)`` (percentile_disc(0.5) "lower" semantics —
    always an actual data value, never an interpolated mean, so both
    engines agree bit-for-bit on doubles). One key-partitioned window
    pass; NULL values excluded. Returns one row per group:
    ``(group_cols..., out_col)``."""
    from pyspark.sql import Window

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    src = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wn = Window.partitionBy(*group_cols)
    ranked = src.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return ranked.where(
        F.col("__rn") == F.ceil(F.col("__n") / 2)
    ).select(*group_cols, F.col("__v").alias(out_col))


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    c: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation:
    a row is an outlier iff ``|x - median| > c * MAD`` where
    ``MAD = median(|x - median|)`` — the screen that, unlike the
    z-score, no outlier can poison (mean and stddev move with the
    contamination; the medians don't, breakdown point 50%). Both
    medians are exact DISCRETE medians (actual data values), so the
    whole predicate is a deterministic double expression both engines
    evaluate identically — no float boundary. Degenerate groups
    (MAD == 0, i.e. >= half the rows sit exactly at the median) flag
    EVERY row off the median, the strictest consistent reading; the
    caller sees ``mad`` in-band to gate on it. Returns the input rows
    (NULL values excluded) + ``(med, mad, outlier)``. Two
    key-partitioned window passes + two broadcast-joinable group
    frames — no corpus self-join, scale-safe for any group count."""
    if c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    from mysql_syncer_spark.operators.spread import pin_small

    src = df.where(F.col(value_col).isNotNull())
    # both median frames are |groups|-sized and each feeds a join the
    # output ALSO depends on through the other branch — unpinned, the
    # final plan re-executes the median window passes once per consumer
    med = pin_small(group_median_disc(src, group_cols, value_col, "med"))
    with_med = src.join(med, group_cols)
    dev = with_med.withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = pin_small(group_median_disc(dev, group_cols, "__dev", "mad"))
    return (
        dev.join(mad, group_cols)
        .withColumn(
            "outlier",
            F.col("__dev") > F.lit(float(c)) * F.col("mad"),
        )
        .drop("__dev")
    )


def theil_sen(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil-Sen robust trend: the slope is the exact
    DISCRETE median of all pairwise slopes (y_j − y_i)/(x_j − x_i)
    over x_i < x_j — the estimator that tolerates ~29% contaminated
    points where OLS (:func:`group_trends`) is moved by one (same
    robust pairing as median/MAD vs mean/stddev). Returns one row per
    group: ``(group_cols..., n_points, n_pairs, slope)``.

    The pair join is QUADRATIC IN POINTS by definition — standard
    practice (followed here) is to run it on a bounded pre-aggregated
    series (daily/hourly rollups, ≤ thousands of points per group),
    where n(n−1)/2 pairs is trivial; the join is group-keyed so groups
    never multiply against each other. Each pairwise slope is one
    double division both engines evaluate identically, and the median
    picks an ACTUAL slope (the :func:`group_median_disc` ceil(n/2)
    rule) — no averaging, no float-order boundary. Groups with < 2
    points emit NULL slope (no pair exists); NULL x or y rows are
    excluded."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    src = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*group_cols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    a = src
    b = (
        src.withColumnRenamed("__x", "__x2")
        .withColumnRenamed("__y", "__y2")
    )
    pairs = a.join(b, group_cols).where(F.col("__x") < F.col("__x2"))
    slopes = pairs.select(
        *group_cols,
        (
            (F.col("__y2") - F.col("__y"))
            / (F.col("__x2") - F.col("__x")).cast("double")
        ).alias("__slope"),
    )
    med = group_median_disc(slopes, group_cols, "__slope", "slope")
    stats = src.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    n_pairs = slopes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return (
        stats.join(n_pairs, group_cols, "left")
        .join(med, group_cols, "left")
        .select(
            *group_cols,
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            "slope",
        )
    )


def category_entropy(
    df: DataFrame,
    group_cols: list[str],
    cat_col: str,
    categories: list[str],
) -> DataFrame:
    """Per-group Shannon entropy of an EXPLICIT category mix — the
    feed-composition monitor (a pipeline shard/day whose source or
    type mix collapses to one category shows entropy → 0; a uniform
    mix shows ln k): ``H = −Σ_i (c_i/n)·ln(c_i/n)`` with 0·ln 0 = 0,
    plus ``norm_entropy = H / ln k`` in [0, 1]. The category list is
    explicit (not discovered) so the per-category counts pivot into
    FIXED columns and the entropy sums in fixed category order — one
    deterministic double expression both engines share (the Benford
    discipline); rows outside the list are counted in ``n_other`` and
    excluded from the mix (stated semantic). ONE combinable groupBy;
    no join, no window."""
    import math

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if len(categories) < 2:
        raise ValueError(
            f"need >= 2 categories, got {len(categories)}"
        )
    if len(set(categories)) != len(categories):
        raise ValueError("categories must be distinct")
    aggs = [
        F.sum((F.col(cat_col) == c).cast("long")).alias(f"__c{i}")
        for i, c in enumerate(categories)
    ] + [
        # NULL-safe: a bare ~isin() is NULL for NULL category rows, which
        # would be counted neither in the mix nor here — count them in
        # n_other explicitly (rows outside the list INCLUDING NULLs).
        F.sum(
            (
                F.col(cat_col).isNull()
                | ~F.col(cat_col).isin(categories)
            ).cast("long")
        ).alias("n_other")
    ]
    g = df.groupBy(*group_cols).agg(*aggs)
    n = None
    for i in range(len(categories)):
        n = F.col(f"__c{i}") if n is None else n + F.col(f"__c{i}")
    ent = None
    for i in range(len(categories)):
        p = F.col(f"__c{i}").cast("double") / F.col("__n")
        term = F.when(
            F.col(f"__c{i}") > 0, -(p * F.log(p))
        ).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    return (
        g.withColumn("__n", n.cast("long"))
        .where(F.col("__n") > 0)
        .select(
            *group_cols,
            F.col("__n").alias("n_rows"),
            "n_other",
            F.round(ent, 6).alias("entropy"),
            F.round(ent / F.lit(math.log(len(categories))), 6).alias(
                "norm_entropy"
            ),
        )
    )


def prop_ztest(
    a: DataFrame,
    b: DataFrame,
    success_col: str,
    z_threshold: float = 2.5758,
) -> DataFrame:
    """Two-proportion z-test — the A/B primitive (did conversion
    change between cohorts/periods/variants?): 1 row ``(n_a, n_b,
    p_a, p_b, z, significant)`` with the pooled-variance statistic

        z = (p_a − p_b) / sqrt(p·(1−p)·(1/n_a + 1/n_b)),  p pooled.

    ``success_col`` is boolean (NULL rows excluded — an unobserved
    outcome is neither success nor failure). All counts are exact
    integers off two 1-row aggs; the z expression is one
    fixed-operand-order double both engines share (sqrt is IEEE
    correctly-rounded). Degenerate pools (p == 0 or p == 1 → zero
    variance) emit NULL z and ``significant = false``. Work: two
    column-pruned scans, no shuffle beyond the 1-row aggs."""
    stats_a = a.where(F.col(success_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum(F.col(success_col).cast("long")).alias("x_a"),
    )
    stats_b = b.where(F.col(success_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum(F.col(success_col).cast("long")).alias("x_b"),
    )
    j = stats_a.crossJoin(F.broadcast(stats_b))
    p_a = F.col("x_a").cast("double") / F.col("n_a")
    p_b = F.col("x_b").cast("double") / F.col("n_b")
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    var = pool * (1 - pool) * (
        1.0 / F.col("n_a") + 1.0 / F.col("n_b")
    )
    z = F.when(var > 0, (p_a - p_b) / F.sqrt(var))
    return j.select(
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("significant"),
    )


def randomization_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    n_perm: int = 64,
    salt: str = "",
) -> DataFrame:
    """E175: deterministic randomization (permutation) test for a
    difference in group means — the significance gate behind "did this
    curation change move the metric or is it noise": observed
    |mean(A) − mean(B)| is compared against the null distribution from
    ``n_perm`` deterministic random relabelings of the rows
    (md5(salt‖perm‖key) coin per row — reproducible, engine-exact,
    order/partitioning-independent; Monte-Carlo randomization rather
    than exhaustive permutation, with the standard add-one p-value of
    Phipson & Smyth 2010 so p is never 0).

    Exactness discipline: group means go through exact DECIMAL(38,12)
    sums (order-independent, bit-identical across engines) and the
    diff is compared at the same 6 dp rounding on BOTH engines, so the
    extreme-count is reproducible — no float summation-order hazard.

    Scale shape: the null distribution restates the table n_perm×
    through ONE row-local ``explode(sequence(...))`` (no driver loop,
    no n_perm jobs) into ONE combinable groupBy over
    2·n_perm cells; the observed diff is a second tiny aggregate.
    Honest cost: shuffle volume is n_perm × #rows of (perm, label,
    value) triples — at 100 TB run it on the metric's
    pre-aggregated per-key frame, not the raw event grain.

    ``group_col`` must have exactly two distinct non-NULL values
    (checked; NULL-group rows are excluded like every two-sample
    test here). Output: one row — ``group_a``, ``group_b``,
    ``diff_obs`` (mean_a − mean_b, 6 dp), ``n_perm``, ``n_extreme``,
    ``p_value`` (6 dp).
    """
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    from mysql_syncer_spark.operators.spread import spread_small

    # project to the three columns the test reads, spread a small scan
    # (the n_perm× explode + per-(perm,row) md5 below runs ABOVE the
    # first exchange — on a one-file table it would serialize on one
    # core), and pin: rows feeds the group probe, the observed diff and
    # the null distribution, and must not re-execute per consumer.
    rows = (
        spread_small(
            df.select(group_col, value_col, key_col).where(
                F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
            )
        )
        .transform(pin)
    )
    groups = [
        r[0]
        for r in rows.select(group_col).distinct().orderBy(group_col)
            .limit(3).collect()
    ]
    if len(groups) != 2:
        raise ValueError(
            f"randomization_test needs exactly 2 groups, found {groups}"
        )
    ga, gb = groups
    dec = F.col(value_col).cast("decimal(38,12)")

    def mean_diff(frame, label_col):
        cells = frame.groupBy(label_col).agg(
            F.sum(dec).alias("__s"), F.count(F.lit(1)).alias("__n")
        )
        # mean_a - mean_b in exact decimal, surfaced at 6 dp
        a = F.max(F.when(F.col(label_col) == 0, F.col("__s")))
        na = F.max(F.when(F.col(label_col) == 0, F.col("__n")))
        b = F.max(F.when(F.col(label_col) == 1, F.col("__s")))
        nb = F.max(F.when(F.col(label_col) == 1, F.col("__n")))
        return cells, a, na, b, nb

    labeled = rows.select(
        F.when(F.col(group_col) == F.lit(ga), F.lit(0))
        .otherwise(F.lit(1)).alias("__lab"),
        F.col(value_col),
    )
    cells, a, na, b, nb = mean_diff(labeled, "__lab")
    obs = cells.agg(
        F.round((a / na - b / nb).cast("double"), 6).alias("diff_obs")
    )

    from mysql_syncer_spark.operators.sampling import hash_bucket

    perm = rows.select(
        F.col(value_col),
        F.col(key_col).alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("__p"),
    ).select(
        "__p",
        F.col(value_col),
        F.pmod(
            hash_bucket(
                F.concat(F.col("__p").cast("string"), F.lit("|"),
                         F.col("__k").cast("string")),
                salt,
            ),
            F.lit(2),
        ).alias("__lab"),
    )
    pc = perm.groupBy("__p", "__lab").agg(
        F.sum(dec).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    a2 = F.max(F.when(F.col("__lab") == 0, F.col("__s")))
    na2 = F.max(F.when(F.col("__lab") == 0, F.col("__n")))
    b2 = F.max(F.when(F.col("__lab") == 1, F.col("__s")))
    nb2 = F.max(F.when(F.col("__lab") == 1, F.col("__n")))
    diffs = pc.groupBy("__p").agg(
        F.round((a2 / na2 - b2 / nb2).cast("double"), 6).alias("__d")
    )
    extreme = diffs.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            (F.abs(F.col("__d")) >= F.abs(F.col("diff_obs"))).cast("long")
        ).alias("n_extreme"),
        F.first("diff_obs").alias("diff_obs"),
    )
    return extreme.select(
        F.lit(str(ga)).alias("group_a"),
        F.lit(str(gb)).alias("group_b"),
        "diff_obs",
        F.lit(n_perm).cast("long").alias("n_perm"),
        F.col("n_extreme").cast("long").alias("n_extreme"),
        F.round(
            (F.col("n_extreme") + 1) / F.lit(float(n_perm + 1)), 6
        ).alias("p_value"),
    )


#: Poisson(1) inverse-CDF thresholds at 12-bit draw grain, as 3-char
#: lowercase hex (threshold_j = ceil(4096 * CDF_j - 0.5) in hex): a
#: 3-hex-char md5 slice compares LEXICOGRAPHICALLY equal to its integer
#: order, so the weight CASE needs no conv()/arithmetic per draw. The
#: draw truncates at weight 6 -- P(X >= 7) ~ 8e-5 is below the 2^-12
#: grain; the truncation is part of the operator definition.
_POIS1_HEX_THRESHOLDS = ("5e3", "bc6", "eb7", "fb2", "ff1", "ffe")


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    key_col: str,
    n_boot: int = 32,
    salt: str = "",
) -> DataFrame:
    """E179: percentile bootstrap confidence interval for the per-group
    mean via the POISSON bootstrap -- the resampling scheme that works
    on distributed data (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): classic bootstrap resampling
    needs n draws from n rows (global coordination), but Binomial(n,
    1/n) -> Poisson(1), so giving every row an INDEPENDENT Poisson(1)
    replicate weight reproduces the bootstrap distribution with one
    row-local draw per (row, replicate) -- no shuffle beyond the final
    group-by, no RNG state.

    Determinism + the codegen-hot-path discipline (this key bench-
    measured 8.6 s naive at sf0.1, ~2-3x cheaper in this form):

    * one md5 digest per (key, replicate//10) computed BEFORE the
      explode yields ten 12-bit draws (3 hex chars each) -- a tenth of
      the digest cost of one-md5-per-replicate;
    * the Poisson(1) inverse CDF runs as fixed-width lowercase-hex
      STRING comparisons against precomputed thresholds
      (:data:`_POIS1_HEX_THRESHOLDS` -- ceil(4096*cdf - 0.5) in hex):
      no conv()/arithmetic per draw, identical lexicographic semantics
      on both engines. At 12-bit grain the draw truncates at weight 6
      (P(X >= 7) ~ 8e-5 is below the grain) -- the truncation is part
      of the operator's definition, mirrored in the oracle;
    * replicate sums run on EXACT fixed-point longs (floor(v * 1e6) --
      micro-unit values, the stated value contract): long sums are
      order-independent and engine-exact where double sums drift and
      DECIMAL sums fall off Spark's fast Long-backed path past
      precision 18. Replicate means are rounded to 6 dp BEFORE ranking
      so both engines pick identical percentile rows.

    The CI is the percentile interval at ranks (2, n_boot-1) of the
    replicate means (~94% at n_boot=32).

    Output: group cols + ``(mean_v, ci_lo, ci_hi, n)``.

    Scale shape: one explode(n_boot) scan + ONE map-side-combinable
    groupBy over groups x n_boot cells + a groups-sized rank window.
    At 100 TB the explode multiplies the scan, not the shuffle: the
    aggregate is partial before the exchange, so shuffle volume is
    |groups| x n_boot rows regardless of data size.
    """
    if n_boot < 4:
        raise ValueError(f"n_boot must be >= 4, got {n_boot}")
    from pyspark.sql import Window

    from mysql_syncer_spark.operators.spread import spread_small

    v = F.col(value_col).cast("double")
    # n_boot digests + 32-way explode + CASE draws all run ABOVE the
    # (map-side-combined) groupBy — spread a small input so that work
    # is not serialized on the scan's task count
    base = spread_small(df.where(v.isNotNull())).select(
        *group_cols,
        v.alias("__v"),
        F.floor(v * F.lit(1_000_000.0)).cast("long").alias("__v6"),
        F.col(key_col).alias("__k"),
    )
    digests = [
        F.md5(
            F.concat(
                F.lit(salt),
                F.col("__k").cast("string"),
                F.lit(f":{g}"),
            )
        )
        for g in range((n_boot + 9) // 10)
    ]
    hexes = F.array(
        *[
            F.substring(digests[b // 10], (b % 10) * 3 + 1, 3)
            for b in range(n_boot)
        ]
    )
    rep = base.select(
        *group_cols, "__v6", F.posexplode(hexes).alias("__b", "__h3")
    )
    w = F.lit(6)
    for j in range(len(_POIS1_HEX_THRESHOLDS) - 1, -1, -1):
        w = F.when(
            F.col("__h3") < F.lit(_POIS1_HEX_THRESHOLDS[j]), F.lit(j)
        ).otherwise(w)
    rep = rep.withColumn("__w", w)
    # zero-weight replicate guard (ADVICE r11): a (group, replicate)
    # cell where every row drew weight 0 (P ~ 0.368**n — realistic for
    # tiny groups) is an empty resample; its mean is undefined. Spark's
    # 0/0 gives NULL but DuckDB's IEEE double 0/0 gives NaN, and the
    # two sort differently — guard the mean to NULL in BOTH engines
    # (oracle mirrors with CASE WHEN SUM(w) > 0) and pin NULL placement
    # explicitly (asc_nulls_first here, NULLS FIRST in the oracle).
    cells = rep.groupBy(*group_cols, "__b").agg(
        F.when(
            F.sum("__w") > 0,
            F.round(
                F.sum(F.col("__w") * F.col("__v6")).cast("double")
                / F.lit(1_000_000.0)
                / F.sum("__w").cast("double"),
                6,
            ),
        ).alias("__bm")
    )
    rk = Window.partitionBy(*group_cols).orderBy(
        F.asc_nulls_first("__bm"), F.asc("__b")
    )
    ranked = cells.withColumn("__r", F.row_number().over(rk))
    ci = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__r") == 2, F.col("__bm"))).alias("ci_lo"),
        F.max(
            F.when(F.col("__r") == n_boot - 1, F.col("__bm"))
        ).alias("ci_hi"),
    )
    point = base.groupBy(*group_cols).agg(
        F.round(
            F.sum("__v6").cast("double")
            / F.lit(1_000_000.0)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
    return point.join(ci, group_cols).select(
        *group_cols, "mean_v", "ci_lo", "ci_hi", "n"
    )


def duckdb_pois1_weight_sql(h3_expr: str) -> str:
    """DuckDB mirror of the truncated Poisson(1) hex-threshold draw
    (``h3_expr`` is a 3-lowercase-hex-char md5 slice)."""
    cases = " ".join(
        f"WHEN {h3_expr} < '{t}' THEN {j}"
        for j, t in enumerate(_POIS1_HEX_THRESHOLDS)
    )
    return f"(CASE {cases} ELSE 6 END)"


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b,
    cats_a: list[str],
    cats_b: list,
) -> DataFrame:
    """E186: χ² test of independence between two categorical columns —
    the assignment audit every experimentation/feed pipeline needs
    ("is event mix independent of the traffic split?"): one row with
    ``(n_rows, chi2, dof, cramers_v)`` over the r×c contingency table
    of EXPLICIT category lists (the Benford/entropy discipline: fixed
    lists pivot the counts into fixed columns, so the χ² sum runs in
    one deterministic cell order both engines share).

    Numeric discipline: every cell term is ``(n·c_ij − r_i·c_j)² /
    (n·r_i·c_j)`` — an integer numerator squared in DECIMAL(38,0)
    (it can exceed 2^53; a double square would round BEFORE the
    division and the two engines could disagree) over an integer
    denominator, each cast to double exactly once. Cramér's V =
    sqrt(χ²/(n·min(r−1,c−1))).

    Scale shape: ONE combinable groupBy-less aggregate (r·c + r + c
    sums, all map-side partial) — no join, no window, no shuffle
    beyond the single 1-row fold. ``col_b`` may be a Column (e.g. a
    derived cohort expression)."""
    if len(cats_a) < 2 or len(cats_b) < 2:
        raise ValueError("need >= 2 categories on both sides")
    if len(set(cats_a)) != len(cats_a) or len(set(cats_b)) != len(cats_b):
        raise ValueError("categories must be distinct")
    a = F.col(col_a)
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    cells = [
        F.sum(((a == ca) & (b == cb)).cast("long")).alias(
            f"__c_{i}_{j}"
        )
        for i, ca in enumerate(cats_a)
        for j, cb in enumerate(cats_b)
    ]
    g = df.agg(*cells)
    row = [
        sum(F.col(f"__c_{i}_{j}") for j in range(len(cats_b)))
        for i in range(len(cats_a))
    ]
    colt = [
        sum(F.col(f"__c_{i}_{j}") for i in range(len(cats_a)))
        for j in range(len(cats_b))
    ]
    n = sum(row)
    chi2 = None
    for i in range(len(cats_a)):
        for j in range(len(cats_b)):
            num = (
                n * F.col(f"__c_{i}_{j}") - row[i] * colt[j]
            ).cast("decimal(38,0)")
            term = F.when(
                (row[i] > 0) & (colt[j] > 0),
                (num * num).cast("double")
                / (n * row[i] * colt[j]).cast("double"),
            ).otherwise(F.lit(0.0))
            chi2 = term if chi2 is None else chi2 + term
    dof = (len(cats_a) - 1) * (len(cats_b) - 1)
    vmin = min(len(cats_a), len(cats_b)) - 1
    return g.select(
        n.cast("long").alias("n_rows"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(dof).cast("int").alias("dof"),
        F.round(
            F.sqrt(chi2 / (n.cast("double") * F.lit(float(vmin)))), 6
        ).alias("cramers_v"),
    )


def concentration_profile(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
) -> DataFrame:
    """E187: per-group concentration audit of an item mix — the
    corpus-governance view of "how dominated is each language by a
    few sources?" (a lang whose Gini → 1 / HHI → 1 is effectively a
    single-crawl corpus however many sources it claims): per group,
    ``(n_rows, n_items, gini, hhi, top_share)`` over the item count
    distribution. Gini uses the sorted-rank closed form
    ``(2·Σ rank_i·x_i − (n+1)·Σx) / (n·Σx)`` with ranks ordered
    ``(count, item)`` — a deterministic integer numerator (no float
    sums to order), each ratio divided once and rounded.

    Scale shape: one count groupBy on (group, item), then a window
    over the per-group ITEM list (bounded by item cardinality, not
    row count) and a |groups|-sized fold. NULL items count as a real
    category via the hash-groupBy (excluded: none)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    cnt = df.groupBy(*group_cols, item_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cnt"), F.col(item_col)
    )
    ranked = cnt.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.sum("__cnt").cast("long").alias("__tot"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("__rk") * F.col("__cnt"))
            .cast("long")
            .alias("__rksum"),
            F.sum(F.col("__cnt") * F.col("__cnt"))
            .cast("long")
            .alias("__sq"),
            F.max("__cnt").cast("long").alias("__top"),
        )
        .select(
            *group_cols,
            F.col("__tot").alias("n_rows"),
            "n_items",
            F.round(
                (
                    2 * F.col("__rksum")
                    - (F.col("n_items") + 1) * F.col("__tot")
                ).cast("double")
                / (F.col("n_items") * F.col("__tot")).cast("double"),
                6,
            ).alias("gini"),
            F.round(
                F.col("__sq").cast("double")
                / (F.col("__tot") * F.col("__tot")).cast("double"),
                6,
            ).alias("hhi"),
            F.round(
                F.col("__top").cast("double")
                / F.col("__tot").cast("double"),
                6,
            ).alias("top_share"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    true_col: str,
    pred_col,
    categories: list[str],
) -> DataFrame:
    """E188: Cohen's κ agreement between two label columns — the
    classifier-vs-ground-truth audit (raw accuracy flatters a
    predictor on a skewed label mix; κ corrects by the agreement the
    marginals produce BY CHANCE): one row ``(n_rows, agreement,
    expected_agreement, kappa)`` over an explicit category list;
    rows where either side falls outside the list are excluded
    (stated semantic, counted in ``n_excluded``).

    Numeric discipline: κ = (n·agree − Σ_k r_k·c_k) /
    (n² − Σ_k r_k·c_k) — integer numerator and denominator (exact
    BIGINT sums), ONE double division, rounded. ONE combinable
    aggregate, no join/window/shuffle beyond the 1-row fold."""
    if len(categories) < 2:
        raise ValueError("need >= 2 categories")
    if len(set(categories)) != len(categories):
        raise ValueError("categories must be distinct")
    t = F.col(true_col)
    p = F.col(pred_col) if isinstance(pred_col, str) else pred_col
    in_t = t.isin(categories)
    in_p = p.isin(categories)
    both = in_t & in_p
    aggs = [
        F.sum(both.cast("long")).alias("__n"),
        F.sum((both & (t == p)).cast("long")).alias("__agree"),
        F.sum(
            (t.isNull() | p.isNull() | ~both).cast("long")
        ).alias("n_excluded"),
    ]
    for i, c in enumerate(categories):
        aggs.append(F.sum((both & (t == c)).cast("long")).alias(f"__r{i}"))
        aggs.append(F.sum((both & (p == c)).cast("long")).alias(f"__p{i}"))
    g = df.agg(*aggs)
    rc = None
    for i in range(len(categories)):
        term = F.col(f"__r{i}") * F.col(f"__p{i}")
        rc = term if rc is None else rc + term
    n = F.col("__n")
    return g.select(
        n.alias("n_rows"),
        "n_excluded",
        F.round(F.col("__agree").cast("double") / n.cast("double"), 6).alias(
            "agreement"
        ),
        F.round(rc.cast("double") / (n * n).cast("double"), 6).alias(
            "expected_agreement"
        ),
        F.round(
            (n * F.col("__agree") - rc).cast("double")
            / (n * n - rc).cast("double"),
            6,
        ).alias("kappa"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    probes: "list[int]",
) -> DataFrame:
    """E194: Kaplan-Meier survival estimator with right-censoring —
    time-to-event analytics (retention: "what fraction of users go
    longer than T without another event?") done correctly: censored
    observations (no next event before the observation window closed)
    leave the at-risk set WITHOUT counting as events, which a naive
    gap histogram gets wrong. Output: one row per probe time
    ``(probe, n_risk, d_events, survival)`` — survival evaluated at
    the largest event time ≤ the probe.

    ``S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)``, computed as
    ``exp(Σ ln(1 − dᵢ/nᵢ))`` over a duration-ordered running window.
    Each ln term is a deterministic function of exact integer (d, n);
    the running sum is framed in ascending-duration order in both
    engines (a window implementation may still reassociate double
    adds internally — surfaced values round to the repo's standing
    6 dp, which absorbs last-ulp differences).

    Scale shape: one combinable groupBy to the DURATION grain, one
    running window over duration-grain rows only (|distinct
    durations|, never the observations), a broadcast 1-row total, and
    a probes-sized join. ``event_col`` is 1 = observed, 0 = censored.
    """
    if not probes:
        raise ValueError("probes must be non-empty")
    if sorted(set(probes)) != sorted(probes):
        raise ValueError("probes must be distinct")
    from pyspark.sql import Window

    dur = F.col(duration_col)
    evt = F.col(event_col)
    g = df.where(dur.isNotNull()).groupBy(
        dur.cast("long").alias("__dur")
    ).agg(
        F.sum(evt.cast("long")).alias("__d"),
        F.count(F.lit(1)).alias("__m"),
    )
    total = g.agg(F.sum("__m").cast("long").alias("__n"))
    w = Window.orderBy("__dur")
    prev = Window.orderBy("__dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = (
        g.crossJoin(F.broadcast(total))
        .withColumn(
            "__risk",
            F.col("__n")
            - F.coalesce(F.sum("__m").over(prev), F.lit(0)),
        )
        .withColumn(
            # a duration where EVERY remaining subject dies (d == n)
            # sends S to exactly 0 — ln(0) is undefined, so carry it
            # as a running flag instead of a log term
            "__dead",
            F.max(
                F.when(
                    (F.col("__d") > 0)
                    & (F.col("__d") >= F.col("__risk")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).over(w),
        )
        .withColumn(
            "__surv",
            F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            (F.col("__d") > 0)
                            & (F.col("__d") < F.col("__risk")),
                            F.log(
                                F.lit(1.0)
                                - F.col("__d").cast("double")
                                / F.col("__risk").cast("double")
                            ),
                        ).otherwise(F.lit(0.0))
                    ).over(w)
                )
            ),
        )
    )
    ev = r.where(F.col("__d") > 0).select(
        "__dur", "__d", "__risk", "__surv"
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(int(p),) for p in probes], "probe long"
    )
    best = (
        grid.join(ev, ev["__dur"] <= grid["probe"], "left")
        .groupBy("probe")
        .agg(F.max(F.struct("__dur", "__risk", "__d", "__surv")).alias("__b"))
    )
    return best.select(
        "probe",
        F.col("__b.__risk").cast("long").alias("n_risk"),
        F.col("__b.__d").cast("long").alias("d_events"),
        F.round(F.col("__b.__surv"), 6).alias("survival"),
    ).orderBy("probe")
