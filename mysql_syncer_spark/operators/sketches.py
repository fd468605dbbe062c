"""Mergeable sketch rollups: distinct counts over ANY time window
without rescanning events — the measure plain rollup maintenance
can't fold.

operators/incremental_agg.py maintains count/sum/min/max because they
are monoids; COUNT DISTINCT is not (two days' distinct counts don't
add). The industry answer is to store the STATE, not the number:
Apache DataSketches HLL sketches are fixed-size (~KBs), mergeable
binary aggregates — keep one sketch per (grain, key) and any
window/rollup query is a union of sketches, never a base rescan.
Spark ships the agg/union/estimate functions natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
JVM-side, map-combinable); this module shapes them into the
daily-rollup workflow:

* ``hll_rollup``          — one pass over the grain: (grain cols,
  sketch) rows, the persisted state table;
* ``hll_rollup_merge``    — fold a new batch's rollup into the stored
  one (same full-outer merge discipline as incremental_agg; unions
  where both sides have state);
* ``hll_estimate_over``   — distinct estimate for any grouping of the
  stored grains: union the sketches per output group, estimate once.

Estimates are approximate (~1-2% at the default lgK); there is no SQL
oracle form — the pytest gates assert tolerance against exact
distincts and, critically, that merged-state estimates EQUAL the
estimate of the directly-computed union (merge loses nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    grain: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lgk: int = 12,
) -> DataFrame:
    """One map-combinable pass: ``(grain..., sketch)`` — the state table
    a daily job appends/merges into. lgK 12 ≈ 1.6 KB per sketch,
    ~1.6% relative standard error."""
    return df.groupBy(*grain).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup_merge(
    stored: DataFrame,
    batch: DataFrame,
    grain: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fold a batch rollup into the stored rollup per grain: union where
    both have state, pass-through otherwise — delta-sized work plus a
    grains-sized merge, the base data never rescanned."""
    a = stored.select(*grain, F.col(sketch_col).alias("__a"))
    b = batch.select(*grain, F.col(sketch_col).alias("__b"))
    return a.join(b, on=grain, how="full_outer").select(
        *grain,
        F.when(F.col("__a").isNull(), F.col("__b"))
        .when(F.col("__b").isNull(), F.col("__a"))
        .otherwise(F.hll_union("__a", "__b"))
        .alias(sketch_col),
    )


def hll_estimate_over(
    rollup: DataFrame,
    group_by: list[str],
    sketch_col: str = "sketch",
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Distinct estimate for any coarser grouping of the stored grain
    (``group_by=[]`` = grand total): union the per-grain sketches into
    each output group, estimate once. Sketch-count-sized work."""
    grouped = (
        rollup.groupBy(*group_by)
        if group_by
        else rollup.groupBy(F.lit(1).alias("__all"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias(out_col)
    )
    return out.drop("__all") if not group_by else out


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable FREQUENCY state (the how-many-times twin of
# the HLL how-many-distinct above). Unlike HLL, the estimate here is fully
# deterministic given the hash family — md5-derived positions, the engine's
# cross-engine idiom (sampling.py) — so a DuckDB oracle can mirror the
# EXACT same construction and the driver hash-gate applies.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: mergeable TOP-FREQUENCY state (the third leg
# of the sketch family — HLL answers how-many-distinct, CMS how-often-is-
# this-item, MG WHICH items are frequent without materializing the full
# key histogram). The classic distributed shape (Agarwal et al. 2013,
# "Mergeable Summaries"): each partition folds its rows into a summary of
# at most ``capacity`` counters in ONE pass with no shuffle; summaries
# merge by adding counts and re-compressing — so the only shuffle in the
# whole pipeline carries <= capacity x n_partitions rows, however many
# keys the data has. Guarantee carried in-band as ``err_bound``:
#   est <= true <= est + err_bound,   err_bound <= N / (capacity + 1)
# (every compression at cut c removes >= (capacity+1)*c mass, so the cuts
# sum to at most N/(capacity+1)). Exactness law: when no fold or merge
# ever exceeds capacity, err_bound == 0 and the result IS the exact
# GROUP-BY count — the oracle-checkable mode the registry query runs in.
# Approximate mode (capacity < distinct keys) is partition-order
# dependent like any MG; its gates are the invariant bounds, not equality.
# ---------------------------------------------------------------------------


def mg_summaries(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries in one ``mapInPandas`` pass:
    rows ``(key, est, dec)`` — at most ``capacity`` key rows plus one
    ``key IS NULL`` sentinel row carrying the partition's cumulative
    decrement. Per Arrow batch the fold is a vectorized
    ``value_counts`` merged into a dict of at most
    ``capacity + batch_distinct`` counters; compression subtracts the
    (capacity+1)-th largest count from every counter and drops the
    non-positive — bounded memory at any partition size. NULL keys are
    excluded from counting (count semantics, like ``cms_build``)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    src = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key")
    )
    key_type = src.schema["key"].dataType.simpleString()
    out_schema = f"key {key_type}, est bigint, dec bigint"

    def fold(batches):
        import pandas as _pd

        counts: dict = {}
        dec = 0
        for pdf in batches:
            for k, n in pdf["key"].value_counts().items():
                counts[k] = counts.get(k, 0) + int(n)
            if len(counts) > capacity:
                vals = sorted(counts.values(), reverse=True)
                cut = vals[capacity]
                counts = {k: v - cut for k, v in counts.items() if v > cut}
                dec += cut
        keys = list(counts)
        # Sentinel yielded as a SEPARATE frame: appending None to an
        # integer key list coerces pandas to float64, silently rounding
        # bigint keys above 2^53 before the Arrow cast back to bigint.
        if keys:
            yield _pd.DataFrame(
                {
                    "key": keys,
                    "est": [counts[k] for k in keys],
                    "dec": [0] * len(keys),
                }
            )
        yield _pd.DataFrame({"key": [None], "est": [0], "dec": [dec]})

    return src.mapInPandas(fold, schema=out_schema)


def mg_merge(summaries: DataFrame, capacity: int) -> DataFrame:
    """Merge per-partition summaries into ONE summary of at most
    ``capacity`` keys: sum per-key counts (a summary-sized shuffle),
    then one final compression — the (capacity+1)-th largest merged
    count, found by a rank window over the <= capacity x n_partitions
    merged rows (summary-sized by construction, so the single-partition
    window is metadata work) and injected as a 1-row broadcast scalar.
    Returns ``(key, est, err_bound)`` with err_bound the total
    decrement (fold cuts + merge cut), identical on every row."""
    from pyspark.sql import Window

    decs = summaries.where(F.col("key").isNull()).agg(
        F.coalesce(F.sum("dec"), F.lit(0)).cast("long").alias("__dec")
    )
    keys = (
        summaries.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )
    ranked = keys.withColumn(
        "__rn",
        F.row_number().over(Window.orderBy(F.desc("est"), F.asc("key"))),
    )
    cut = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == capacity + 1, F.col("est"))),
            F.lit(0),
        )
        .cast("long")
        .alias("__cut")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(decs))
        .where(F.col("est") > F.col("__cut"))
        .select(
            "key",
            (F.col("est") - F.col("__cut")).cast("long").alias("est"),
            (F.col("__dec") + F.col("__cut")).cast("long").alias(
                "err_bound"
            ),
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    capacity: int,
    min_share: float | None = None,
    min_count: int = 1,
) -> DataFrame:
    """End-to-end heavy hitters over ``key_col``: per-partition MG fold
    (zero shuffle) -> summary-sized merge -> threshold. Returns
    ``(<key_col>, est, err_bound, n_total)`` where ``est`` is a LOWER
    bound on the true count (``est <= true <= est + err_bound``), so
    ``est >= t`` guarantees the key truly occurs >= t times, and every
    key with true count > n_total x min_share + err_bound is guaranteed
    present. ``n_total`` (exact non-NULL row count, one count-star scan
    injected as a broadcast scalar) anchors the share threshold."""
    if min_share is not None and not 0.0 <= min_share <= 1.0:
        raise ValueError(f"min_share must be in [0, 1], got {min_share}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    merged = mg_merge(mg_summaries(df, key_col, capacity), capacity)
    total = df.where(F.col(key_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    out = merged.crossJoin(F.broadcast(total)).where(
        F.col("est") >= F.lit(min_count)
    )
    if min_share is not None:
        # integer-exact share test: est / n_total > min_share as
        # est * denom > n_total * numer with min_share = numer/denom
        # quantized to the sampling lattice (1/10000) — no float
        # boundary for the oracle to disagree on.
        numer = int(round(min_share * 10_000))
        out = out.where(
            F.col("est") * F.lit(10_000) > F.col("n_total") * F.lit(numer)
        )
    return out.select(
        F.col("key").alias(key_col), "est", "err_bound", "n_total"
    )


def _cms_bucket(col, row: int, width: int, salt: str):
    """Row ``row``'s bucket for an item: md5-prefix uniform mod width.
    Spark half of the shared idiom; the SQL half is
    ``('0x' || substr(md5('salt#row#' || item), 1, 15))::BIGINT % width``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}#{row}#"), col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch over ``item_col``: ``(row, bucket,
    cnt)`` with at most depth×width rows — fixed-size state however
    large the input.

    Shape: a row-local explode of the ``depth`` hash rows (posexplode
    of an array literal — no join, no driver state) then ONE
    map-side-combinable count/sum shuffle on (row, bucket). Cells the
    data never hits are simply absent (semantically zero), so an empty
    corpus costs nothing and two sketches merge by unioning rows and
    re-summing (`cms_merge`).

    NULL items are skipped (consistent with count semantics). With
    ``weight_col`` the sketch accumulates that column's sum instead of
    row counts (e.g. pre-aggregated term frequencies)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    c = F.col(item_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.where(c.isNotNull())
        .select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"),
                            _cms_bucket(c, i, width, salt).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("__pos", "__rb"),
            w.alias("__w"),
        )
        .select(
            F.col("__rb.row").alias("row"),
            F.col("__rb.bucket").alias("bucket"),
            F.col("__w"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width, salt):
    union + re-sum — the monoid property that makes per-shard / per-day
    sketches foldable without rescanning anything."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate counts for ``items``: each item probes its
    ``depth`` cells and takes the MIN (the count-min guarantee:
    estimate ≥ true count, ≤ true + ε·N w.h.p.).

    The sketch is at most depth×width rows — broadcast it onto the
    (item, row) probe explode; a missing cell is a zero estimate. One
    tiny groupBy on the item closes the min."""
    c = F.col(item_col)
    probes = items.where(c.isNotNull()).select(
        c.alias(item_col),
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(c, i, width, salt).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__pos", "__rb"),
    ).select(item_col, F.col("__rb.row").alias("row"),
             F.col("__rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left_outer")
    return (
        joined.withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_count"))
    )


def hll_intersection_estimate(
    rollup: DataFrame,
    key_col: str,
    a_value,
    b_value,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Distinct-count INTERSECTION estimate from stored HLL state —
    the set-algebra question unions alone can't answer ("users who did
    BOTH X and Y"), served without any base rescan via
    inclusion-exclusion: |A∩B| = |A| + |B| − |A∪B|, every term an HLL
    estimate over the persisted per-grain sketches.

    Returns ONE row: ``(n_a, n_b, n_union, n_intersection)`` with the
    intersection floored at 0 (inclusion-exclusion subtracts two noisy
    estimates, so small true intersections can come out slightly
    negative — the standard failure mode; relative error grows as
    |A∪B| / |A∩B|, so this is for intersections that are a meaningful
    fraction of the union, which the pytest tolerance gate states).
    Work is sketch-count-sized: filter the grain rows, union twice,
    estimate three times — no data scan."""
    part_a = rollup.where(F.col(key_col) == a_value)
    part_b = rollup.where(F.col(key_col) == b_value)
    both = rollup.where(F.col(key_col).isin([a_value, b_value]))
    ea = part_a.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "n_a"
        )
    )
    eb = part_b.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "n_b"
        )
    )
    eu = both.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "n_union"
        )
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .withColumn(
            "n_intersection",
            F.greatest(
                F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0)
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summaries: the FOURTH sketch leg (HLL answers
# how-many-distinct, CMS how-often, MG which-items-frequent — this one
# answers WHERE the distribution sits: medians/p99s without a full sort).
# Classic distributed shape (a deterministic ε-summary in the GK family,
# compressed by uniform rank-grid downsampling): each partition folds its
# values into at most ``capacity`` (value, weight) rows in ONE pass with
# no shuffle; summaries merge by summing per-value weights (a
# summary-sized shuffle) and re-compressing on the same grid. Every kept
# value is an ACTUAL data value (percentile_disc semantics, never an
# interpolated mean). Guarantee carried in-band as ``err`` — for any
# query, |rank(answer) - target_rank| <= err_bound, where each grid
# compression of an n-row (sub)summary contributes <= ceil(n/capacity)
# (kept cumulative ranks are EXACT; dropped rows sit between kept
# neighbors whose rank gap is bounded by the grid spacing). Exactness
# law: when no fold or merge ever sees more than ``capacity`` distinct
# values, no compression happens, err == 0, and the summary IS the exact
# value histogram — quantile answers equal the exact rank rule
# ``min value with cum_count >= ceil(p * N)`` (the oracle-checkable mode
# the registry query runs in; bounded-cardinality numeric columns are
# common at 100 TB — quantities, ratings, bucketed sizes).
# ---------------------------------------------------------------------------


def quantile_summaries(
    df: DataFrame, value_col: str, capacity: int
) -> DataFrame:
    """Per-partition quantile summaries in one ``mapInPandas`` pass:
    rows ``(value, weight, err)`` — at most ``capacity`` value rows
    plus one ``value IS NULL`` sentinel carrying the partition's rank
    error bound. Per partition the fold is a vectorized
    ``value_counts``; if distinct values exceed ``capacity`` the sorted
    histogram is downsampled to the uniform rank grid (keep the first
    value whose cumulative count reaches each of ``capacity`` grid
    levels; kept weight = cumulative-count delta, so total mass and
    kept ranks stay EXACT) at a rank-error cost of ceil(n/capacity).
    NULL values are excluded (count semantics, like ``mg_summaries``)."""
    if capacity < 2:
        raise ValueError(f"capacity must be >= 2, got {capacity}")
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("value")
    )
    value_type = src.schema["value"].dataType.simpleString()
    out_schema = f"value {value_type}, weight bigint, err bigint"

    def fold(batches):
        import math

        import numpy as _np
        import pandas as _pd

        counts: dict = {}
        for pdf in batches:
            for v, n in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(n)
        err = 0
        if len(counts) > capacity:
            vals = _np.array(sorted(counts))
            cum = _np.cumsum([counts[v] for v in vals])
            n = int(cum[-1])
            targets = _np.ceil(
                _np.arange(1, capacity + 1) * n / capacity
            ).astype(_np.int64)
            idx = _np.unique(_np.searchsorted(cum, targets, side="left"))
            kept_cum = cum[idx]
            weights = _np.diff(_np.concatenate([[0], kept_cum]))
            vals, cum = vals[idx], kept_cum
            err = math.ceil(n / capacity)
            counts = dict(zip(vals.tolist(), weights.tolist()))
        keys = sorted(counts)
        # Sentinel yielded as a SEPARATE frame: appending None to an
        # integer value list coerces pandas to float64, silently rounding
        # bigint values above 2^53 before the Arrow cast back to bigint.
        if keys:
            yield _pd.DataFrame(
                {
                    "value": keys,
                    "weight": [counts[k] for k in keys],
                    "err": [0] * len(keys),
                }
            )
        yield _pd.DataFrame({"value": [None], "weight": [0], "err": [err]})

    return src.mapInPandas(fold, schema=out_schema)


def quantile_merge(summaries: DataFrame, capacity: int) -> DataFrame:
    """Merge per-partition summaries into ONE summary of at most
    ``capacity + 1`` values: sum per-value weights (a summary-sized
    shuffle), then — only if the merged histogram exceeds capacity —
    one grid re-compression via two rank windows over the
    <= capacity x n_partitions merged rows (summary-sized by
    construction, so the single-partition windows are metadata work).
    Returns ``(value, weight, err_bound)`` rows sorted by value with
    ``err_bound`` (fold errors + merge compression) identical on every
    row; Σ weight is always the exact non-NULL row count."""
    from pyspark.sql import Window

    if capacity < 2:
        raise ValueError(f"capacity must be >= 2, got {capacity}")
    errs = summaries.where(F.col("value").isNull()).agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long").alias("__err")
    )
    hist = (
        summaries.where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("weight").alias("weight"))
    )
    n_distinct = hist.count()
    if n_distinct <= capacity:
        return (
            hist.crossJoin(F.broadcast(errs))
            .select(
                "value",
                F.col("weight").cast("long").alias("weight"),
                F.col("__err").alias("err_bound"),
            )
            .orderBy("value")
        )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    cum = hist.select(
        "value",
        F.sum("weight").over(w).alias("cum"),
        F.sum("weight").over(total).alias("n"),
    )
    # keep the first row reaching each of `capacity` uniform rank grid
    # levels: row kept iff its cum crosses a grid boundary its
    # predecessor did not (ceil-grid index strictly increases)
    g = F.ceil(F.col("cum") * capacity / F.col("n"))
    g_prev = F.ceil(
        F.coalesce(F.lag("cum").over(Window.orderBy("value")), F.lit(0))
        * capacity
        / F.col("n")
    )
    # the max-value row (cum == n) is ALWAYS kept even when an earlier
    # row already reached the top grid cell — dropping it would lose
    # the tail mass (Σ weight must stay the exact row count); so the
    # merged summary holds at most capacity + 1 rows
    kept = cum.withColumn(
        "__keep", (g > g_prev) | (F.col("cum") == F.col("n"))
    ).where(F.col("__keep"))
    kept = kept.withColumn(
        "weight",
        (
            F.col("cum")
            - F.coalesce(F.lag("cum").over(Window.orderBy("value")), F.lit(0))
        ).cast("long"),
    )
    merge_err = kept.agg(
        F.ceil(F.max("n") / capacity).cast("long").alias("__merr")
    )
    return (
        kept.crossJoin(F.broadcast(errs))
        .crossJoin(F.broadcast(merge_err))
        .select(
            "value",
            "weight",
            (F.col("__err") + F.col("__merr")).alias("err_bound"),
        )
        .orderBy("value")
    )


def quantile_query(
    merged: DataFrame, ps: list[float]
) -> DataFrame:
    """Answer quantiles from a merged summary: for each p in ``ps``,
    the smallest summary value whose cumulative weight reaches
    ``ceil(p * N)`` (percentile_disc "lower" semantics; N = Σ weight =
    exact row count). Returns ``(p, value, err_bound)`` sorted by p.
    Work is summary-sized: one cumulative window + a broadcast join of
    the len(ps)-row probe table."""
    from pyspark.sql import Window

    if not ps:
        raise ValueError("ps must be non-empty")
    for p in ps:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"each p must be in (0, 1], got {p}")
    spark = merged.sparkSession
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "value",
        "err_bound",
        F.sum("weight").over(w).alias("cum"),
        F.sum("weight").over(Window.partitionBy()).alias("n"),
    )
    probes = spark.createDataFrame([(float(p),) for p in ps], "p double")
    hits = cum.join(
        F.broadcast(probes),
        F.col("cum") >= F.ceil(F.col("p") * F.col("n")),
    )
    return (
        hits.groupBy("p")
        .agg(
            F.min_by("value", "value").alias("value"),
            F.max("err_bound").alias("err_bound"),
        )
        .orderBy("p")
    )


def quantile_sketch(
    df: DataFrame, value_col: str, capacity: int, ps: list[float]
) -> DataFrame:
    """End-to-end quantile sketch over ``value_col``: per-partition
    fold (zero shuffle) -> summary-sized merge -> grid query. Returns
    ``(p, value, err_bound)`` where ``value`` is an actual data value
    whose rank is within ``err_bound`` of the exact target rank
    ``ceil(p * N)`` — and EQUAL to it (err_bound == 0) whenever
    ``capacity`` covers the distinct-value count, the oracle-checkable
    exactness mode."""
    merged = quantile_merge(
        quantile_summaries(df, value_col, capacity), capacity
    )
    return quantile_query(merged, ps)


# ---------------------------------------------------------------------------
# Exact mergeable distinct-count state: the EXACT sibling of the HLL
# rollup for integral keys. Spark 4 ships bitmap aggregates
# (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
# bitmap_or_agg / bitmap_count): each (grain, bucket) row stores a
# 32768-bit roaring-style segment (~4 KB), OR-merge is lossless, and
# popcount over the OR is the EXACT distinct count — so daily bitmap
# state answers any window/rollup regrouping exactly, base never
# rescanned, where HLL (E*) answers it within ~1-2%. Trade-off carried
# in the module docstring: bitmap state grows with the key-id RANGE
# (range/32768 buckets per grain when dense), HLL stays fixed-size —
# bitmaps win for dense integral ids (user ids, row ids), HLL for
# unbounded/string domains.
# ---------------------------------------------------------------------------


def bitmap_rollup(
    df: DataFrame, grain_cols: list[str], key_col: str
) -> DataFrame:
    """One pass over the grain: ``(grain cols..., __bucket, __bitmap)``
    rows — the persisted exact-distinct state table. NULL keys are
    excluded (count semantics, like ``hll_rollup``). Map-combinable:
    the only shuffle carries (grain x occupied-bucket) bitmap rows."""
    if not grain_cols:
        raise ValueError("grain_cols must be non-empty")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *grain_cols,
            F.expr(f"bitmap_bucket_number({key_col})").alias("__bucket"),
            F.expr(f"bitmap_bit_position({key_col})").alias("__pos"),
        )
        .groupBy(*grain_cols, "__bucket")
        .agg(F.expr("bitmap_construct_agg(__pos)").alias("__bitmap"))
    )


def bitmap_rollup_merge(
    stored: DataFrame, batch: DataFrame, grain_cols: list[str]
) -> DataFrame:
    """Fold a new batch's rollup into the stored one: union + OR-merge
    per (grain, bucket) — lossless (OR of exact sets is the exact
    union), so incremental maintenance never drifts. Same full-outer
    discipline as ``hll_rollup_merge`` but with nothing to lose."""
    return (
        stored.unionByName(batch)
        .groupBy(*grain_cols, "__bucket")
        .agg(F.expr("bitmap_or_agg(__bitmap)").alias("__bitmap"))
    )


def bitmap_distinct_over(
    rollup: DataFrame, group_cols: list[str]
) -> DataFrame:
    """EXACT distinct count for any grouping of the stored grains:
    OR the bitmaps per (output group, bucket), popcount, sum buckets.
    Returns ``(group_cols..., n_distinct)``. Work is rollup-sized —
    the base table is never rescanned, and unlike the HLL sibling the
    answer is exact, not ±1-2%."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return (
        rollup.groupBy(*group_cols, "__bucket")
        .agg(F.expr("bitmap_or_agg(__bitmap)").alias("__bm"))
        .select(
            *group_cols,
            F.expr("bitmap_count(__bm)").alias("__c"),
        )
        .groupBy(*group_cols)
        .agg(F.sum("__c").cast("long").alias("n_distinct"))
    )


def bitmap_overlap(
    rollup: DataFrame,
    group_cols: list[str],
    segment_col: str,
    seg_a,
    seg_b,
) -> DataFrame:
    """EXACT audience overlap between two segments, answered FROM THE
    STORED BITMAP STATE — "how many distinct users did BOTH view and
    purchase, per day" without rescanning events: by
    inclusion-exclusion |A∩B| = |A| + |B| − |A∪B|, and all three
    terms are exact popcounts over OR-merged bitmaps (the identity is
    exact only because the counts are — the HLL sibling's E* version
    of this subtraction amplifies relative error, which is why the
    sketch module ships HLL intersection as an ESTIMATE and this as
    the exact path for integral ids). Requires ``segment_col`` to be
    one of the rollup's grain columns. Returns ``(group_cols...,
    n_a, n_b, n_union, n_overlap, jaccard)`` — groups where a segment
    is absent count it 0; jaccard is the single final division,
    zero-guarded so an all-empty group (n_union = 0) yields 0.0
    instead of NULL (or an ANSI-mode divide error).
    Work is rollup-sized: three grain regroupings + one group join."""
    a = bitmap_distinct_over(
        rollup.where(F.col(segment_col) == seg_a), group_cols
    ).withColumnRenamed("n_distinct", "n_a")
    b = bitmap_distinct_over(
        rollup.where(F.col(segment_col) == seg_b), group_cols
    ).withColumnRenamed("n_distinct", "n_b")
    u = bitmap_distinct_over(
        rollup.where(F.col(segment_col).isin([seg_a, seg_b])), group_cols
    ).withColumnRenamed("n_distinct", "n_union")
    j = u.join(a, group_cols, "left").join(b, group_cols, "left")
    n_a = F.coalesce(F.col("n_a"), F.lit(0))
    n_b = F.coalesce(F.col("n_b"), F.lit(0))
    inter = (n_a + n_b - F.col("n_union")).cast("long")
    return j.select(
        *group_cols,
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.col("n_union").cast("long").alias("n_union"),
        inter.alias("n_overlap"),
        F.when(F.col("n_union") > 0, inter / F.col("n_union"))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )
