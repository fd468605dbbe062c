"""Incremental aggregate maintenance: keep a materialized rollup in
sync with its base table by folding in DELTAS, never recomputing.

The 100 TB economics: a daily rollup over an append-heavy fact table
costs a full scan per refresh if recomputed — but count/sum/min-of-
inserts/max-of-inserts are all COMMUTATIVE MONOIDS, so the new rollup
is just ``old ⊕ agg(delta)``: work proportional to the delta, like
the engine's digest short-circuit is proportional to change
(reference economics: Synchronizer.php:204-225 — never redo unchanged
work).

Supported measures: ``count``, ``sum``, ``min``, ``max``, and
``signed_count`` — the self-maintainable aggregates. Deletes/updates
are handled the standard MV way, as compensating deltas, with one
modeling requirement per measure kind:

* ``sum`` retracts by feeding the NEGATED values in the delta.
* ``count`` does NOT retract (its delta aggregate is ``F.count``,
  always non-negative). A retractable count must be modeled as
  ``signed_count`` over a ±1 column (+1 insert, −1 delete) — it
  aggregates with ``F.sum``, so a compensating batch genuinely
  decrements. ``("signed_count", "*")`` counts every delta row as +1
  (bootstrap-friendly: base tables have no sign column).
* ``min``/``max`` are insert-only maintainable; deletions can't
  retract an extremum without a base rescan, which
  ``apply_agg_delta`` enforces via ``allow_negative``. The
  DELETE-maintainable extremum lives one level down: the classic
  two-level structure (``value_support_snapshot`` /
  ``apply_value_support_delta`` / ``extremum_snapshot`` /
  ``apply_extremum_delta``) keeps a per-(group, value) multiplicity
  table — itself a signed_count rollup, hence fully retractable — and
  re-derives min/max for TOUCHED groups only from that table. State is
  distinct-values-per-group-sized (≪ base for low-cardinality
  measures), every refresh term delta-keyed.

Shape: agg(delta) is one combinable shuffle over the delta only; the
merge is a full-outer join on the group key — the rollup table is
groups-sized (≪ base), so at scale this is a broadcast or a cheap
co-partitioned join, never a base-table scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure -> (delta-side aggregate, merge function old×new -> new)
_MONOIDS = {
    "count": (lambda c: F.count(c), lambda a, b: a + b),
    # count as sum-of-signs: the RETRACTABLE count (see module doc)
    "signed_count": (lambda c: F.sum(c), lambda a, b: a + b),
    "sum": (lambda c: F.sum(c), lambda a, b: a + b),
    "min": (lambda c: F.min(c), lambda a, b: F.least(a, b)),
    "max": (lambda c: F.max(c), lambda a, b: F.greatest(a, b)),
}


def agg_snapshot(
    base: DataFrame, keys: list[str], measures: Mapping[str, tuple[str, str]]
) -> DataFrame:
    """Bootstrap the rollup: ``measures`` maps output column ->
    (op, source column), e.g. ``{"n": ("count", "*"), "total":
    ("sum", "o_totalprice")}``."""
    aggs = []
    for out, (op, col) in measures.items():
        if op not in _MONOIDS:
            raise ValueError(f"unsupported measure op {op!r}")
        src = F.lit(1) if col == "*" else F.col(col)
        aggs.append(_MONOIDS[op][0](src).alias(out))
    return base.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    rollup: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: Mapping[str, tuple[str, str]],
    allow_negative: bool = False,
) -> DataFrame:
    """Fold an insert batch (or compensating delta) into the rollup:
    ``old ⊕ agg(delta)`` per group. New groups appear; untouched groups
    pass through BIT-IDENTICAL (full-outer + coalesce, no arithmetic on
    the unmatched side). ``allow_negative=True`` permits compensating
    deltas for sum/signed_count (negated values / −1 signs); plain
    ``count`` cannot retract — model it as ``signed_count`` over a ±1
    column (see module doc). min/max raise under ``allow_negative``
    because deletions can't retract an extremum without a base rescan."""
    if allow_negative and any(
        op in ("min", "max") for op, _ in measures.values()
    ):
        raise ValueError(
            "min/max are not delete-maintainable; recompute via "
            "agg_snapshot for compensating deltas on extrema"
        )
    d = agg_snapshot(delta, keys, measures)
    old = rollup.select(
        *keys, *[F.col(m).alias(f"__old_{m}") for m in measures]
    )
    new = d.select(*keys, *[F.col(m).alias(f"__new_{m}") for m in measures])
    merged = old.join(new, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for m, (op, _) in measures.items():
        a, b = F.col(f"__old_{m}"), F.col(f"__new_{m}")
        combined = (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(_MONOIDS[op][1](a, b))
        )
        out_cols.append(combined.alias(m))
    return merged.select(*out_cols)


def value_support_snapshot(
    base: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Bootstrap the two-level extremum state: per-(group, value)
    multiplicity ``__support`` — ONE combinable groupBy, output sized
    by distinct values per group (≪ base for low-cardinality
    measures). NULL values are excluded (min/max ignore them, so they
    carry no extremum information)."""
    return (
        base.where(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("__support"))
    )


def apply_value_support_delta(
    support: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    sign_col: str = "sign",
) -> DataFrame:
    """Fold a signed delta batch (+1 insert / −1 delete per row) into
    the support table: one combinable shuffle over the DELTA, then a
    full-outer merge on (group, value) — the state table is
    values-sized, never the base. Values whose multiplicity reaches 0
    drop out (that's what makes the extremum retractable); a batch
    that over-deletes (multiplicity would go negative) raises at
    evaluation time — it means the delta doesn't match the base the
    state was built from. The merge is NULL-SAFE on the group keys:
    groupBy keeps NULL as a group, so a NULL-keyed group must match
    its own delta rows (plain equi-join would split them into a false
    underflow + a phantom insert)."""
    d = (
        delta.where(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.sum(sign_col).cast("long").alias("__d"))
    )
    on = keys + [value_col]
    # rename the delta side so every reference is unambiguous, then
    # join with null-safe equality per column
    d2 = d.select(
        *[F.col(c).alias(f"__r_{c}") for c in on], "__d"
    )
    merged = support.join(d2, _ns_cond(on), "full_outer")
    sel = [
        F.coalesce(F.col(c), F.col(f"__r_{c}")).alias(c) for c in on
    ]
    total = F.coalesce(F.col("__support"), F.lit(0)) + F.coalesce(
        F.col("__d"), F.lit(0)
    )
    guarded = F.when(
        total < 0,
        F.raise_error(
            F.concat(
                F.lit("support underflow for value "),
                F.coalesce(
                    F.col(value_col), F.col(f"__r_{value_col}")
                ).cast("string"),
            )
        ).cast("long"),
    ).otherwise(total)
    return (
        merged.select(*sel, guarded.alias("__support"))
        .where(F.col("__support") > 0)
    )


def _ns_cond(cols: list[str]):
    """Null-safe conjunction join condition between a frame's columns
    and their ``__r_``-renamed twins — NULL keys are legitimate group
    values here (groupBy keeps them), so every key join in the
    two-level maintainers must use ``<=>``."""
    cond = F.col(cols[0]).eqNullSafe(F.col(f"__r_{cols[0]}"))
    for c in cols[1:]:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    return cond


def _apply_touched_group_delta(
    view: DataFrame,
    support_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
    derive,
) -> DataFrame:
    """Shared touched-group discipline for views derived from the
    support table: untouched groups pass through bit-identical
    (broadcast NULL-SAFE anti on the delta's group keys), touched
    groups re-derive from the already-advanced support (broadcast
    null-safe semi) via ``derive(pruned_support)`` — a pure function,
    so the refresh is idempotent given the support table."""
    touched = delta.select(
        *[F.col(c).alias(f"__r_{c}") for c in keys]
    ).distinct()
    kept = view.join(F.broadcast(touched), _ns_cond(keys), "left_anti")
    pruned = support_new.join(
        F.broadcast(touched), _ns_cond(keys), "left_semi"
    )
    return kept.unionByName(derive(pruned))


def extremum_snapshot(
    support: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Derive the extremum view from the support table: per group
    ``(min_<v>, max_<v>, n_values)`` where n_values counts non-NULL
    base rows. Support-table-sized work, ≪ base."""
    return support.groupBy(*keys).agg(
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.sum("__support").cast("long").alias("n_values"),
    )


def frequent_values_from_support(
    support: DataFrame, keys: list[str], value_col: str, k: int
) -> DataFrame:
    """Exact per-group top-k most frequent values, derived from the
    support table — the EXACT, delete-maintainable sibling of the
    Misra-Gries sketch (operators/sketches.py): MG bounds error under
    a fixed budget and cannot retract; this is exact at
    values-per-group state cost and inherits the support table's
    retractability. Deterministic tie-break: count desc, value asc.
    Output: ``(keys..., value, n, rank)``."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*keys).orderBy(
        F.col("__support").desc(), F.col(value_col).asc()
    )
    return (
        support.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            *keys,
            F.col(value_col).alias("value"),
            F.col("__support").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def apply_frequent_delta(
    topk: DataFrame,
    support_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """Advance the exact top-k-frequent view one delta batch: same
    touched-group discipline as :func:`apply_extremum_delta` —
    untouched groups pass through bit-identical (broadcast anti), the
    batch's groups re-rank from the (already-advanced) support table
    (broadcast semi), so a delete can DEMOTE a front-runner and
    surface the runner-up exactly — the retraction MG structurally
    cannot do."""
    return _apply_touched_group_delta(
        topk,
        support_new,
        delta,
        keys,
        lambda sup: frequent_values_from_support(sup, keys, value_col, k),
    )


def distinct_from_support(
    support: DataFrame, keys: list[str]
) -> DataFrame:
    """Exact per-group DISTINCT-value count from the support table —
    the third pure derive (extrema E152, top-k-frequent E156, this):
    distinct = the number of support rows per group, so it inherits
    the table's exact retractability — which neither sketch leg can
    offer (HLL cannot delete at all; bitmap OR-merge is insert-only).
    Output: ``(keys..., n_distinct, n_values)``."""
    return support.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("__support").cast("long").alias("n_values"),
    )


def apply_distinct_delta(
    view: DataFrame,
    support_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Advance the exact distinct-count view one signed batch — same
    touched-group discipline as the extremum/frequent folds: a delete
    that removes a value's LAST occurrence decrements the distinct
    count exactly; re-inserting it restores it."""
    return _apply_touched_group_delta(
        view,
        support_new,
        delta,
        keys,
        lambda sup: distinct_from_support(sup, keys),
    )


def apply_extremum_delta(
    extrema: DataFrame,
    support_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Advance the extremum view one delta batch WITHOUT touching
    untouched groups: groups not named in the delta pass through
    bit-identical (broadcast anti-join); touched groups are re-derived
    from the (already-advanced) support table, pruned with a broadcast
    semi on the delta's group keys — so a delete that removes a
    group's current max correctly falls back to the runner-up, and a
    group whose support emptied disappears. Work ∝ delta groups ×
    their value counts, never the base."""
    return _apply_touched_group_delta(
        extrema,
        support_new,
        delta,
        keys,
        lambda sup: extremum_snapshot(sup, keys, value_col),
    )
