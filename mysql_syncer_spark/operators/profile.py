"""Single-pass table profiling: per-column quality stats for triage.

Before a 100 TB corpus goes anywhere near training, someone asks "how
null is this column, how many distinct values, what's the range?" —
the data-quality audit the reference performs implicitly by diffing
everything (Synchronizer.php:193-230) and re-running until converged.
This operator answers it directly, in ONE scan:

* count / nulls / min / max for ALL columns ride one wide
  ``HashAggregate`` (a single scan, single-row output);
* exact distincts deliberately do NOT join that agg: Spark plans
  multi-column DISTINCT aggregates as Expand → Sort → SortAggregate
  over C×rows wide tuples (benched ~10× the cost of the stats agg at
  sf0.1). Instead the columns are unpivoted FIRST (``stack`` — a
  projection) into narrow ``(column, value)`` pairs and reduced by two
  map-side-combinable hash aggregates: distinct pairs, then counts per
  column. Two narrow scans beat one sorted wide one — the plan gate
  pins all-hash-aggregate, zero Expand/Sort;
* min/max are stringified with a deterministic per-type rule
  (floats/doubles round to 6 dp through decimal, so the same values
  print identically on any engine — the rule the DuckDB oracle
  mirrors digit for digit).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stringify(col: Column, dtype: T.DataType) -> Column:
    """Deterministic cross-engine rendering of a min/max value."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # fixed scale via decimal: '123.450000' on every engine — a raw
        # double→string cast is shortest-roundtrip and engine-dependent
        return F.round(col, 6).cast("decimal(28,6)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) into
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)`` —
    one row per column, one scan total. ``n_distinct`` is exact and
    excludes NULL (SQL COUNT(DISTINCT) semantics)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n for n, t in fields.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType,
                                  T.BinaryType))
        ]
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    # (r12 negative result: spread_small on the projected scan measured
    # flat-to-worse isolated — profile_orders 1.05 -> 0.98 but
    # profile_drift_orders 1.30 -> 1.38; both passes are combinable
    # aggregations that map-side-reduce on the scan task, so the
    # payload shuffle buys nothing. Reverted per the wave-7 rule:
    # never pay an exchange for a flat result.)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{c}"),  # non-null count
            _stringify(F.min(col), fields[c]).alias(f"__mn_{c}"),
            _stringify(F.max(col), fields[c]).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    stats = wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, __nn, min_value, max_value)",
    )
    # exact distincts over narrow unpivoted pairs: stack is a pure
    # projection; both groupBys are map-side-combinable hash aggs (a
    # string cast is injective for every profiled type, so counting
    # distinct casts == counting distinct values; NULLs are excluded
    # up front to match COUNT(DISTINCT) semantics)
    pair_args = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    distincts = (
        df.selectExpr(
            f"stack({len(cols)}, {pair_args}) as (column, __v)"
        )
        .where(F.col("__v").isNotNull())
        .groupBy("column", "__v")
        .agg(F.lit(1))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        stats.join(distincts, on="column", how="left")
        .select(
            "column",
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col("__nn")).alias("n_nulls"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_value",
            "max_value",
        )
    )


def group_quantiles(
    df: "DataFrame",
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    approx: bool = False,
    round_dp: int = 6,
) -> "DataFrame":
    """Per-group quantiles at the (group, prob) grain — the grouped
    sibling of the corpus-level token-quantile stats (and winsorize's
    cut-point kernel), e.g. per-domain doc-length percentiles or
    per-event-type value distributions for drift triage.

    ONE combinable groupBy shuffle computes all probs together
    (``percentile(v, array(...))``); the per-prob rows come from a
    row-local posexplode of the result array, so adding probs never
    adds jobs. ``approx=True`` swaps in ``approx_percentile``
    (t-digest, fixed-size mergeable state) — the 100 TB form: exact
    percentile buffers each group's values on the agg side, the sketch
    does not. Values round to ``round_dp`` (cross-engine float
    convention). NULL values are ignored by both forms; groups with
    only NULLs yield NULL quantiles.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    if not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = (
        F.expr(
            f"approx_percentile(`{value_col}`, "
            f"array({', '.join(str(float(p)) for p in probs)}), 10000)"
        )
        if approx
        else F.percentile(F.col(value_col), parr)
    )
    # an all-NULL group aggregates to scalar NULL, not an array —
    # substitute a NULL-per-prob array so the group keeps one row per
    # prob (same shape as every other group)
    nulls = F.array(
        *[F.lit(None).cast("double") for _ in probs]
    )
    grouped = df.groupBy(*group_cols).agg(
        F.coalesce(agg, nulls).alias("__qs")
    )
    return grouped.select(
        *group_cols,
        F.posexplode_outer("__qs").alias("__i", "__v"),
    ).select(
        *group_cols,
        F.element_at(parr, F.col("__i") + 1).alias("prob"),
        F.round(F.col("__v"), round_dp).alias("quantile"),
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: list[str],
    pk_cols: list[str] | None = None,
) -> DataFrame:
    """Child rows whose foreign key matches NO parent row — the
    referential-integrity breakage a sync that copies tables
    independently can introduce (the reference syncs table-by-table
    with FK checks OFF: SynchronizerFactory.php:16-19, so orphan
    auditing is the matching post-sync gate). NULL foreign keys are
    NOT orphans (SQL FK semantics: NULL references nothing).

    One left-anti hash join on the key; the parent side is projected
    to its key columns before the join (a parent's width never crosses
    the shuffle)."""
    if not fk_cols:
        raise ValueError("fk_cols must be non-empty")
    pk_cols = pk_cols or fk_cols
    if len(pk_cols) != len(fk_cols):
        raise ValueError("fk_cols and pk_cols must align")
    pkeys = parent.select(
        *[F.col(p).alias(f"__pk_{i}") for i, p in enumerate(pk_cols)]
    ).dropDuplicates()
    cond = None
    for i, f in enumerate(fk_cols):
        eq = F.col(f) == F.col(f"__pk_{i}")
        cond = eq if cond is None else (cond & eq)
    non_null = None
    for f in fk_cols:
        nn = F.col(f).isNotNull()
        non_null = nn if non_null is None else (non_null & nn)
    return child.where(non_null).join(pkeys, cond, "left_anti")


def duplicate_pks(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Primary-key values appearing more than once: ``(pk..., n_rows)``
    — one combinable count shuffle + a HAVING filter."""
    if not pk_cols:
        raise ValueError("pk_cols must be non-empty")
    return (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def integrity_report(
    checks: list[tuple[str, DataFrame]],
) -> DataFrame:
    """Fold named violation frames (from `fk_orphans` /
    `duplicate_pks`) into one ``(constraint, violations)`` summary —
    each check is a count agg over its (already change-sized)
    violation frame; the union is constraint-sized."""
    if not checks:
        raise ValueError("checks must be non-empty")
    out = None
    for name, frame in checks:
        row = frame.agg(
            F.count(F.lit(1)).cast("long").alias("violations")
        ).select(F.lit(name).alias("constraint"), "violations")
        out = row if out is None else out.unionByName(row)
    return out


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Schema-health diff between two snapshots: per column, row /
    null / distinct counts on both sides plus the null-RATE delta —
    the cheap early-warning that a upstream feed started dropping a
    field or collapsing a domain (distinct crash) before anything
    downstream trains on it. Two single-pass profiles (profile_table)
    joined on the column name; everything emitted is an exact integer
    or a ratio of exact integers, so the DuckDB oracle matches without
    stringification subtleties (min/max stay in profile_table, which
    owns the cross-engine rendering rules)."""
    po = profile_table(old, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("n_distinct_a"),
    )
    pn = profile_table(new, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("n_distinct_b"),
    )
    return po.join(pn, "column", "full_outer").select(
        "column",
        "n_rows_a", "n_rows_b",
        "n_nulls_a", "n_nulls_b",
        "n_distinct_a", "n_distinct_b",
        F.round(
            F.col("n_nulls_b") / F.col("n_rows_b")
            - F.col("n_nulls_a") / F.col("n_rows_a"),
            9,
        ).alias("null_rate_delta"),
    )


def fd_audit(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit: for each candidate ``(determinant,
    dependent)`` pair, does ``determinant -> dependent`` hold — i.e.
    does every determinant value map to exactly one dependent value?
    The schema-discovery primitive (is o_custkey -> c_nationkey a real
    FK-path invariant? is zip -> city clean enough to normalize out?)
    and the data-QA screen (violations = corrupt or genuinely
    multivalued).

    Per pair: ONE combinable groupBy on the determinant counting
    distinct dependents; a determinant value with > 1 distinct
    dependents (NULLs excluded — an absent dependent contradicts
    nothing) is a violating key. Output, one row per candidate pair:
    ``(determinant, dependent, n_keys, n_violating_keys, holds)``.
    Pairs are independent plans unioned together — each is
    aggregation-only (no joins), so the audit over k pairs costs k
    column-pruned scans that AQE runs concurrently; at 100 TB submit
    the pairs that share a determinant together (same shuffle key)."""
    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs = []
    for det, dep in pairs:
        if det == dep:
            raise ValueError(f"determinant == dependent: {det!r}")
        per_key = (
            df.groupBy(F.col(det).alias("__k"))
            .agg(F.count_distinct(F.col(dep)).alias("__nd"))
        )
        outs.append(
            per_key.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("__nd") > 1).cast("long")).alias(
                    "n_violating_keys"
                ),
                (F.sum((F.col("__nd") > 1).cast("long")) == 0).alias(
                    "holds"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


#: Benford first-digit probabilities log10(1 + 1/d), d = 1..9, as
#: 17-significant-digit literals — both engines parse the identical
#: decimal string to the identical IEEE double, so the chi-square
#: below has no cross-engine float boundary.
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_screen(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    min_rows: int = 100,
) -> DataFrame:
    """Benford first-digit integrity screen per group: naturally
    occurring multi-magnitude amounts follow P(d) = log10(1 + 1/d);
    fabricated, capped, or unit-defaulted values don't — a high
    chi-square against Benford is the classic books-audit flag
    (Nigrini), useful here as a data-forensics pass over ingested
    numeric feeds. First digit = leading digit of |value| (sign and
    decimal point are magnitude artifacts); zero/NULL values carry no
    leading digit and are excluded. Output per group: ``(group_cols...,
    n_rows, chi2, suspicious)`` with ``chi2 = Σ_d (obs_d − e_d)²/e_d``
    (e_d = P(d)·n) and ``suspicious = chi2 > 20.09`` (χ²₈ at p=0.01).
    Groups under ``min_rows`` are excluded — the test has no power
    there. ONE combinable groupBy with nine pivoted conditional counts
    (digit extraction is row-local codegen); the chi-square is the
    nine per-digit terms added in FIXED digit order, so both engines
    produce the identical IEEE double — no fold-order boundary."""
    if min_rows < 1:
        raise ValueError(f"min_rows must be >= 1, got {min_rows}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    d = F.substring(
        F.regexp_replace(
            F.format_string("%.15e", F.abs(F.col(value_col))), r"[.]", ""
        ),
        1,
        1,
    ).cast("int")
    src = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .withColumn("__d", d)
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum((F.col("__d") == dd).cast("long")).alias(f"__c{dd}")
        for dd in range(1, 10)
    ]
    per_group = src.groupBy(*group_cols).agg(*aggs)
    chi2 = None
    for dd, p_d in BENFORD_P.items():
        e = F.lit(p_d) * F.col("n_rows")
        term = (F.col(f"__c{dd}") - e) * (F.col(f"__c{dd}") - e) / e
        chi2 = term if chi2 is None else chi2 + term
    return (
        per_group.where(F.col("n_rows") >= min_rows)
        .select(
            *group_cols,
            "n_rows",
            F.round(chi2, 6).alias("chi2"),
            (chi2 > 20.09).alias("suspicious"),
        )
    )


def exact_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_bins: int,
    range_buckets: int = 4096,
    out_col: str = "bin",
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Exact NTILE (equal-frequency quantile binning) WITHOUT a
    global/whole-group sort window — the featurization step (quantile
    discretization, monotone calibration buckets) whose naive SQL form
    (``NTILE(k) OVER ([PARTITION BY g] ORDER BY value)``) funnels an
    entire dataset (or an entire hot group) through one partition.
    ``group_cols`` bins within each group independently (the common
    per-segment feature form, e.g. value decile within event_type);
    empty/None bins globally.

    Decomposition: a row's rank within its group under the total order
    ``(value, md5(key), key)`` is

        rank = C_less(value) + r_within(value, key)

    and each term is computed with ONLY bounded windows:

    * ``C_less`` — rows with a strictly smaller value: group by
      (group, value) (combinable; a 50%-duplicated value collapses to
      ONE row), split each group's distinct-value frame into
      ``range_buckets`` uniform value ranges (per-group min/max from a
      tiny agg), per-range totals + a window over the group's
      <= range_buckets-row histogram give range offsets, and a
      per-(group, RANGE) window over the distinct-value frame finishes
      the prefix — no window ever spans more than one range of
      DISTINCT values.
    * ``r_within`` — the row's rank among its value's ties, ordered by
      ``(md5(key), key)``: the E158 two-level trick on the tie group
      (per-(group, value, hex-bucket) counts, a per-(group, VALUE)
      window over its <= 4096-row bucket histogram, a
      per-(group, value, bucket) row_number) — a pathological
      50%-duplicated value runs windows of ties/4096 rows, never the
      whole tie group.

    The bin then follows NTILE's convention in closed form (first
    ``N mod k`` bins take ``ceil(N/k)`` rows, N per group). A NULL
    GROUP key is one ordinary partition (SQL PARTITION BY semantics;
    the internal joins go through a struct-wrapped group key so NULLs
    match). NULL
    values are excluded (documented; SQL NTILE would order them
    arbitrarily).

    Honest limit: the distinct-value ranges are UNIFORM in value
    space, so an adversarial distribution (all distinct values
    clustered in one range next to a lone outlier) degrades the
    C_less window to the distinct-value count of that range;
    duplicates — the common real skew — are immune by construction.
    Output: input columns + ``out_col`` (1-based bin, long).
    """
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if range_buckets < 1:
        raise ValueError(
            f"range_buckets must be >= 1, got {range_buckets}"
        )
    g = list(group_cols or [])
    rows = df.where(F.col(value_col).isNotNull())
    # Null-safe group handling: plain equi-joins on the group columns
    # never match NULL keys, which would silently drop the NULL
    # partition the oracle's NTILE(...) PARTITION BY keeps. Wrap the
    # group key in a single struct column — struct equality treats NULL
    # fields as equal (Spark's null-safe ordering inside structs), so
    # every groupBy/join/window below sees the NULL group as one
    # ordinary key.
    if g:
        rows = rows.withColumn("__g", F.struct(*g))
    gk = ["__g"] if g else []
    v = F.col(value_col).cast("double")

    dv = rows.groupBy(*gk, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    if g:
        bounds = dv.groupBy(*gk).agg(
            F.min(v).alias("__mn"), F.max(v).alias("__mx")
        )
        dvb = dv.join(bounds, gk)
    else:
        bounds = dv.agg(F.min(v).alias("__mn"), F.max(v).alias("__mx"))
        dvb = dv.crossJoin(F.broadcast(bounds))
    dvb = dvb.withColumn(
        "__rid",
        F.when(
            F.col("__mx") > F.col("__mn"),
            F.least(
                F.floor(
                    (v - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * range_buckets
                ),
                F.lit(range_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).drop("__mn", "__mx")
    rhist = dvb.groupBy(*gk, "__rid").agg(F.sum("__cnt").alias("__rn"))
    roff_w = Window.partitionBy(*gk).orderBy("__rid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rall_w = Window.partitionBy(*gk).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    roff = rhist.withColumn(
        "__roff", F.coalesce(F.sum("__rn").over(roff_w), F.lit(0))
    ).withColumn("__N", F.sum("__rn").over(rall_w))
    in_range_w = (
        Window.partitionBy(*gk, "__rid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    roff_sel = roff.select(*gk, "__rid", "__roff", "__N")
    if not g:
        roff_sel = F.broadcast(roff_sel)
    dv_less = (
        dvb.join(roff_sel, [*gk, "__rid"])
        .withColumn(
            "__less",
            F.col("__roff")
            + F.coalesce(F.sum("__cnt").over(in_range_w), F.lit(0)),
        )
        .select(*gk, value_col, "__less", "__N")
    )

    pr = F.md5(F.col(key_col).cast("string"))
    # (r12 note: pinning dv/keyed with pin_small measured 1.81 → 2.20 s
    # — the shared exchanges are reused as designed and the eager
    # materialization only added jobs. Left lazy deliberately.)
    keyed = rows.join(dv_less, [*gk, value_col]).withColumn(
        "__pr", pr
    ).withColumn("__b", F.substring(F.col("__pr"), 1, 3))
    vb = keyed.groupBy(*gk, value_col, "__b").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    vb_w = (
        Window.partitionBy(*gk, value_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vb_off = vb.withColumn(
        "__boff", F.coalesce(F.sum("__bn").over(vb_w), F.lit(0))
    ).select(*gk, value_col, "__b", "__boff")
    local_w = Window.partitionBy(*gk, value_col, "__b").orderBy(
        "__pr", key_col
    )
    ranked = (
        keyed.join(vb_off, [*gk, value_col, "__b"])
        .withColumn("__local", F.row_number().over(local_w))
        .withColumn(
            "__rank",
            F.col("__less") + F.col("__boff") + F.col("__local"),
        )
    )
    # NTILE convention: q = N // k, rem = N % k; the first rem bins
    # hold q+1 rows.
    q = (F.col("__N") / n_bins).cast("long")
    rem = F.col("__N") % n_bins
    big_span = rem * (q + 1)
    bin_expr = F.when(
        F.col("__rank") <= big_span,
        F.ceil(F.col("__rank") / (q + 1)),
    ).otherwise(
        rem + F.ceil((F.col("__rank") - big_span) / F.greatest(q, F.lit(1)))
    )
    out_cols = df.columns
    return ranked.select(
        *out_cols, bin_expr.cast("long").alias(out_col)
    )
