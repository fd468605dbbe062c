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
  ``apply_agg_delta`` enforces via ``allow_negative``.

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
