"""Privacy / re-identification screening: k-anonymity, l-diversity
and t-closeness over quasi-identifiers, with generalization helpers
to repair violations.

The governance sibling of the PII scanner (operators/text.py): PII
finds DIRECT identifiers inside text; this module measures INDIRECT
re-identification risk — a row whose quasi-identifier combination
(nation × segment × age-band × ...) is shared by fewer than k rows is
linkable even with every direct identifier scrubbed. A release is
k-anonymous iff every occupied quasi-identifier cell has ≥ k rows.

Shapes: the audit is ONE combinable groupBy on the quasi columns
(cell-domain-sized output); generalization is row-local codegen
(floor-bucket numerics, truncate strings) — coarsening monotonically
merges cells, so repeated generalize → audit loops converge. Nothing
here shuffles more than the cell histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_cells(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per-cell audit: every occupied quasi-identifier combination with
    its row count and a ``risky`` flag (count < k). NULL is a cell
    value like any other (NULL quasi values still partition rows)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("risky", F.col("n_rows") < k)
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row release gate: ``(n_cells, n_risky_cells, rows_at_risk,
    min_cell_size, k_anonymous)`` — the number the privacy review
    asks for. Work = the cell histogram + one tiny agg."""
    cells = k_anonymity_cells(df, quasi_cols, k)
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("risky").cast("long")).alias("n_risky_cells"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("n_rows"))), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("n_rows").alias("min_cell_size"),
        (F.sum(F.col("risky").cast("long")) == 0).alias("k_anonymous"),
    )


def l_diversity_cells(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """Per-cell l-diversity audit: for every occupied quasi-identifier
    cell, the number of DISTINCT sensitive values it contains and a
    ``risky`` flag (diversity < l). The attack k-anonymity misses:
    a cell can hold >= k rows yet leak the sensitive attribute
    outright when every row in it shares one value (homogeneity
    attack) — l-diversity requires >= l distinct sensitive values per
    cell. NULL sensitive values are excluded from the diversity count
    (an absent attribute discloses nothing); NULL quasi values still
    partition rows, as in :func:`k_anonymity_cells`. ONE combinable
    groupBy (count-distinct over the cell domain), cell-sized output."""
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot be a quasi column"
        )
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("diversity"),
        )
        .withColumn("risky", F.col("diversity") < l)
    )


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """One-row release gate for l-diversity: ``(n_cells, n_risky_cells,
    rows_at_risk, min_diversity, l_diverse)`` — the homogeneity-attack
    companion to :func:`k_anonymity_report`. Work = the cell histogram
    + one tiny agg."""
    cells = l_diversity_cells(df, quasi_cols, sensitive_col, l)
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("risky").cast("long")).alias("n_risky_cells"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("n_rows"))), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("diversity").alias("min_diversity"),
        (F.sum(F.col("risky").cast("long")) == 0).alias("l_diverse"),
    )


def _validate_t_closeness_args(
    quasi_cols: list[str], sensitive_col: str, t: float
) -> None:
    if not 0 < t < 1:
        raise ValueError(f"t must be in (0, 1), got {t}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot be a quasi column"
        )


def t_closeness_cells(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float
) -> DataFrame:
    """Per-cell t-closeness audit for a CATEGORICAL sensitive
    attribute: the distance from each quasi-identifier cell's
    sensitive-value distribution to the GLOBAL distribution, flagged
    ``risky`` when it exceeds ``t``. The skewness attack l-diversity
    misses: a cell can hold l distinct values yet be 95% one rare
    disease — diverse, but far from the population baseline, so
    membership in the cell itself discloses. With equal ground
    distance the Earth-Mover's Distance reduces to total variation:
    EMD(P,Q) = ½ Σ_v |p_v − q_v|.

    Cross-engine exactness: the distance is assembled in INTEGER
    arithmetic over counts — with cell size n_c, global size N,
    per-(cell,value) count n_cs and global count n_s,

        EMD = [ Σ_{v∈cell} |n_cs·N − n_s·n_c|  +  n_c·(N − Σ_{v∈cell} n_s) ]
              / (2·n_c·N)

    (the second term folds in the values ABSENT from the cell, where
    |p−q| = q). Everything is exact bigint until the single final
    division, so Spark and any SQL oracle agree bit-for-bit. Shapes:
    one combinable groupBy on (quasi, sensitive), a window sum on the
    cell grain, the value-domain histogram broadcast — nothing
    shuffles more than the (cell × value) histogram. NULL sensitive
    values are excluded (as in :func:`l_diversity_cells`); NULL quasi
    values still partition rows."""
    from pyspark.sql import Window

    _validate_t_closeness_args(quasi_cols, sensitive_col, t)
    base = df.where(F.col(sensitive_col).isNotNull())
    cv = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n_cs")
    )
    cv = cv.withColumn(
        "__n_c", F.sum("__n_cs").over(Window.partitionBy(*quasi_cols))
    )
    gv = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("__n_s"))
    tot = base.agg(F.count(F.lit(1)).alias("__N"))
    j = cv.join(F.broadcast(gv), sensitive_col).crossJoin(F.broadcast(tot))
    num = F.sum(
        F.abs(F.col("__n_cs") * F.col("__N") - F.col("__n_s") * F.col("__n_c"))
    ) + F.max("__n_c") * (F.max("__N") - F.sum("__n_s"))
    cells = j.groupBy(*quasi_cols).agg(
        F.max("__n_c").cast("long").alias("n_rows"),
        (
            num / (F.lit(2.0) * F.max("__n_c") * F.max("__N"))
        ).alias("emd"),
    )
    return cells.withColumn("risky", F.col("emd") > t)


def t_closeness_ordered_cells(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float
) -> DataFrame:
    """Per-cell t-closeness audit for an ORDERED (numeric) sensitive
    attribute: EMD with the ordered ground distance, where moving
    probability mass across many RANKS costs more — the distance is
    to the GLOBAL distribution, so two cells with identical
    categorical TVD can score differently by where their mass sits
    relative to baseline (e.g. under a uniform baseline over three
    salary bands, a {lowest, adjacent} cell is farther than a
    {lowest, highest} one — the low-skewed cell needs more mass moved
    across ranks), which the categorical reduction structurally
    cannot see. Over the global ordered value domain v_1 < … < v_m,

        EMD = Σ_{i=1..m-1} |Σ_{j≤i} (p_j − q_j)| / (m − 1)

    assembled, like :func:`t_closeness_cells`, in exact INTEGER
    arithmetic (cumulative Σ_{j≤i}(n_cj·N − n_j·n_c), one final
    division by n_c·N·(m−1)) so any SQL oracle agrees bit-for-bit.
    Shape: the scaffold is cells × the global value domain (every cell
    needs a cumulative position at every domain value — absent values
    count 0), built by cross-joining the broadcast domain histogram;
    work and output are (cells × m)-sized, the honest cost of the
    ordered metric, so generalize the sensitive column first when its
    domain is large. m = 1 degenerates to EMD 0."""
    from pyspark.sql import Window

    _validate_t_closeness_args(quasi_cols, sensitive_col, t)
    base = df.where(F.col(sensitive_col).isNotNull())
    cv = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n_cs")
    )
    cells = cv.groupBy(*quasi_cols).agg(
        F.sum("__n_cs").cast("long").alias("__n_c")
    )
    gv = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("__n_s"))
    tot = gv.agg(
        F.sum("__n_s").cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__m"),
    )
    scaffold = (
        cells.crossJoin(F.broadcast(gv))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cv), [*quasi_cols, sensitive_col], "left")
        .withColumn("__n_cs", F.coalesce(F.col("__n_cs"), F.lit(0)))
    )
    cum = F.sum(
        F.col("__n_cs") * F.col("__N") - F.col("__n_s") * F.col("__n_c")
    ).over(
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scaffold.withColumn("__cum", cum)
    out = ranked.groupBy(*quasi_cols).agg(
        F.max("__n_c").cast("long").alias("n_rows"),
        F.when(F.max("__m") > 1,
            F.sum(F.abs("__cum"))
            / (F.max("__n_c") * F.max("__N") * (F.max("__m") - F.lit(1)))
        ).otherwise(F.lit(0.0)).alias("emd"),
    )
    return out.withColumn("risky", F.col("emd") > t)


def _t_closeness_report_from_cells(cells: DataFrame) -> DataFrame:
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("risky").cast("long")).alias("n_risky_cells"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("n_rows"))), F.lit(0)
        ).cast("long").alias("rows_at_risk"),
        F.max("emd").alias("max_emd"),
        (F.sum(F.col("risky").cast("long")) == 0).alias("t_close"),
    )


def t_closeness_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float
) -> DataFrame:
    """One-row release gate for categorical t-closeness: ``(n_cells,
    n_risky_cells, rows_at_risk, max_emd, t_close)`` — completes the
    triad of gates (:func:`k_anonymity_report`,
    :func:`l_diversity_report`). Work = the cell histogram + one tiny
    agg."""
    return _t_closeness_report_from_cells(
        t_closeness_cells(df, quasi_cols, sensitive_col, t)
    )


def t_closeness_ordered_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float
) -> DataFrame:
    """One-row release gate for ordered t-closeness — same columns as
    :func:`t_closeness_report` over the rank-aware EMD."""
    return _t_closeness_report_from_cells(
        t_closeness_ordered_cells(df, quasi_cols, sensitive_col, t)
    )


def generalize_numeric(col: Column | str, width: int) -> Column:
    """Coarsen a numeric quasi-identifier to its ``width``-sized band
    lower bound (floor-bucket) — the standard generalization step;
    widening ``width`` monotonically merges cells."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def generalize_prefix(col: Column | str, length: int) -> Column:
    """Coarsen a string quasi-identifier to its first ``length``
    characters (zip → zip3 style)."""
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, length)


def dp_group_counts(
    df: DataFrame,
    group_cols: "Sequence[str]",
    epsilon: float,
    seed: str | None = None,
    out_col: str = "dp_count",
) -> DataFrame:
    """E176: epsilon-differentially-private group counts via the
    Laplace mechanism -- the standard release form for aggregate
    statistics over sensitive rows (count queries have sensitivity 1,
    so noise is Laplace(1/eps); Dwork et al. 2006). Output: the
    grouping columns and the noisy count (rounded to the nearest
    integer, clamped at 0 -- post-processing preserves DP); the true
    count is NOT emitted.

    Noise derivation: a uniform u in (-1/2, 1/2) from the md5 of
    (seed || group key), mapped through the Laplace inverse CDF
    -(1/eps) * sign(u) * ln(1 - 2|u|). With a per-release random
    ``seed`` this IS the Laplace mechanism (u is uniform and
    independent of the data given the seed); a FIXED seed makes the
    release deterministic -- which is what lets the DuckDB oracle
    reproduce it bit-for-bit and what tests need -- but ties the noise
    to the group key, making it recomputable-and-subtractable by any
    consumer who knows the seed. The safe mode is therefore the
    DEFAULT: ``seed=None`` draws a fresh ``secrets.token_hex(16)`` per
    release. Pass an explicit seed only for reproducible
    tests/oracles, and never publish two releases under one seed.

    Scale shape: ONE map-side-combinable groupBy; the noise is a
    row-local codegen expression over the #groups-sized result. No
    collect, no UDF.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if seed is None:
        import secrets

        seed = secrets.token_hex(16)
    gcols = list(group_cols)
    counts = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__n"))
    key = F.concat_ws(
        "", F.lit(seed), *[F.col(c).cast("string") for c in gcols]
    )
    # 13 hex digits -> uniform in [0, 1) at 2^-52 grain, then shift to
    # (-1/2, 1/2); u == 0 maps to noise 0 (measure-zero under a real
    # random seed)
    # clamp away from the u = -1/2 endpoint: an all-zero md5 prefix
    # (probability 16^-13 per group) would hit ln(0) = -inf and ANSI
    # mode throws casting infinity to long; the clamp moves that one
    # measure-zero draw by 1e-15 and changes nothing else
    u = F.greatest(
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
        / F.lit(float(16 ** 13))
        - F.lit(0.5),
        F.lit(-0.5 + 1e-15),
    )
    lap = (
        F.lit(-1.0 / float(epsilon))
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    noisy = F.greatest(
        F.round(F.col("__n") + lap, 0).cast("long"), F.lit(0)
    )
    return counts.select(*gcols, noisy.alias(out_col))
