"""Event-sequence analytics: transition matrices and touch attribution.

Two classic product/clickstream operators that live one level above the
funnel (operators/funnel.py): instead of asking "how far did each key
get through ONE prescribed path", they characterize the paths
themselves.

* ``event_transitions`` — the first-order Markov view of the stream:
  for every ordered pair of event types, how often does type B
  IMMEDIATELY follow type A within the same key's timeline, and what
  fraction of A's continuations go to B. The output is the
  |types|x|types| transition matrix product analysts diagram as a
  state machine and ML pipelines use as a session-behavior feature.

* ``attribute_conversions`` — marketing-style attribution: every
  conversion event is credited to the LAST (or FIRST) preceding
  touch event of the same key. The streaming-shaped formulation is a
  single ``last(..., ignorenulls=True)`` carry-forward window — no
  self-join, no correlated subquery, one shuffle on the key.

Spark shapes (both all-built-in, codegen end to end):

* transitions: one window shuffle on the key (``lag`` over
  (ts, tie) order) -> one combinable groupBy on (prev, next). The
  matrix is |types|^2 rows — tiny — so the row-probability
  normalization is a window over the aggregated matrix, not the
  stream. At 100 TB the only data-sized exchange is the per-key
  window, the same exchange sessionization already pays; a pipeline
  computing both should repartition by key once and share it.

* attribution: one window shuffle on the key. The carry-forward
  ``last(when(is_touch, x), ignorenulls=True)`` over ROWS UNBOUNDED
  PRECEDING .. 1 PRECEDING is Spark's exact equivalent of SQL's
  ``LAG(expr IGNORE NULLS)``: both touch columns (type and ts) are
  projected from the SAME carried row because they are non-null on
  exactly the same rows. State per key is one row — watermark-friendly
  if ported to Structured Streaming.

Determinism: all orderings are (ts, tie_col) with the caller's unique
tie column required, so same-timestamp events resolve identically in
Spark and any SQL oracle.

Reference anchor: the reference engine has no sequence analytics
(its events are sync actions, Synchronizer.php:88-149); this module is
training-/product-pipeline surface beyond the reference, same charter
as operators/funnel.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
    prob_decimals: int = 6,
) -> DataFrame:
    """First-order transition matrix over per-key event timelines.

    Output: one row per observed (``prev_type``, ``next_type``) pair
    with ``n`` (BIGINT transition count) and ``prob`` (row-stochastic:
    n / sum(n) over the same ``prev_type``, rounded to
    ``prob_decimals``). Each key's first event has no predecessor and
    contributes nothing; keys with a single event vanish entirely.

    ``tie_col`` must be unique per row (an event id): it makes the
    within-key order — and therefore the matrix — deterministic under
    equal timestamps.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    pairs = (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # matrix-sized (|types|^2 rows): the normalizing window is cheap
    row_total = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n") / F.sum("n").over(row_total), prob_decimals
        ).alias("prob"),
    )


def session_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
    gap: str = "30 MINUTE",
    max_steps: int = 5,
    top_k: int = 20,
    share_decimals: int = 6,
) -> DataFrame:
    """Top-k most common session paths: the event-type sequence each
    session opens with, counted across all sessions.

    Sessionization is the standard gap rule (a new session starts after
    ``gap`` of silence), sharing the per-key window exchange with
    ``sessionize``/``event_transitions``. Each session's path is its
    first ``max_steps`` event types joined with ``>`` — truncation is
    the deliberate scale bound: path cardinality can never exceed
    |types|^max_steps, so the path aggregation's key domain is fixed
    regardless of corpus size (an unbounded path column would make the
    groupBy key domain grow with the longest session).

    Plan: one per-key window (lag + running sum -> session ids), one
    groupBy on (key, session) building the ordered path via
    ``array_sort(collect_list(struct))`` — order restored explicitly,
    never assumed — then a combinable groupBy on the path and a
    matrix-local share window. Output: (path, n_sessions BIGINT,
    share) — top ``top_k`` by count with the path string as the
    deterministic tie-break.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        F.when(
            prev.isNull()
            | (F.col(ts_col) - prev > F.expr(f"INTERVAL {gap}")),
            1,
        )
        .otherwise(0)
    )
    sess = df.select(
        key_col,
        ts_col,
        tie_col,
        type_col,
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__sid"),
    )
    paths = sess.groupBy(key_col, "__sid").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(ts_col, tie_col, type_col)
                        )
                    ),
                    lambda s: s[type_col],
                ),
                1,
                max_steps,
            ),
            ">",
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    total = Window.partitionBy()
    return (
        agg.select(
            "path",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.round(
                F.col("n_sessions") / F.sum("n_sessions").over(total),
                share_decimals,
            ).alias("share"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(top_k)
    )


def attribute_conversions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    model: str = "last",
) -> DataFrame:
    """Credit every ``conversion_type`` event to its ``model``-touch.

    ``model='last'``: the latest strictly-preceding touch event of the
    same key (last-touch attribution). ``model='first'``: the key's
    earliest touch that precedes the conversion (first-touch).
    "Preceding" is row order (ts, tie), so a touch sharing the
    conversion's timestamp attributes iff its tie id is smaller.

    Output: one row per conversion event — ``key_col``, ``tie_col``
    (the conversion's id), ``conv_ts``, ``touch_type``/``touch_ts``
    (NULL when the key had no prior touch: the "unattributed" bucket),
    and ``micros_to_convert`` (BIGINT, NULL when unattributed).
    """
    if model not in ("last", "first"):
        raise ValueError(f"model must be 'last' or 'first', got {model!r}")
    is_touch = F.col(type_col).isin(list(touch_types))
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def _carry(expr: Column) -> Column:
        guarded = F.when(is_touch, expr)
        if model == "last":
            return F.last(guarded, ignorenulls=True).over(w)
        return F.first(guarded, ignorenulls=True).over(w)

    return (
        df.select(
            key_col,
            tie_col,
            F.col(ts_col).alias("conv_ts"),
            F.col(type_col).alias("__type"),
            _carry(F.col(type_col)).alias("touch_type"),
            _carry(F.col(ts_col)).alias("touch_ts"),
        )
        .where(F.col("__type") == conversion_type)
        .select(
            key_col,
            tie_col,
            "conv_ts",
            "touch_type",
            "touch_ts",
            (
                # cast handles TIMESTAMP_NTZ parquet columns; any zone
                # shift the cast applies cancels in the difference
                F.unix_micros(F.col("conv_ts").cast("timestamp"))
                - F.unix_micros(F.col("touch_ts").cast("timestamp"))
            ).cast("long").alias("micros_to_convert"),
        )
    )


def transition_entropy(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str,
    categories: "list[str]",
) -> DataFrame:
    """E191: next-event predictability per state — the conditional
    entropy H(next | prev = s) of the first-order transition matrix
    (event_transitions' row distributions, summarized): a state whose
    entropy → 0 has a deterministic successor (funnel step); one near
    ln k is noise. Output per prev state: ``(prev_type,
    n_transitions, entropy, norm_entropy, perplexity)`` with
    perplexity = exp(H) ("effective branching factor").

    Fixed explicit category list for the NEXT dimension: conditional
    counts pivot into fixed columns, the entropy sums in one
    deterministic order (the Benford/entropy discipline); transitions
    whose next type falls outside the list are excluded from that
    row's distribution. Scale shape: the same single lag window as
    event_transitions (the sessionization exchange), then ONE
    combinable groupBy on prev_type — |states| rows out."""
    if len(categories) < 2:
        raise ValueError("need >= 2 categories")
    if len(set(categories)) != len(categories):
        raise ValueError("categories must be distinct")
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    nxt = F.col("next_type")
    pairs = df.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    g = pairs.groupBy("prev_type").agg(
        *[
            F.sum((nxt == c).cast("long")).alias(f"__c{i}")
            for i, c in enumerate(categories)
        ]
    )
    n = sum(F.col(f"__c{i}") for i in range(len(categories)))
    ent = None
    for i in range(len(categories)):
        p = F.col(f"__c{i}").cast("double") / n.cast("double")
        term = F.when(
            F.col(f"__c{i}") > 0, -(p * F.log(p))
        ).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    import math

    return (
        g.where(n > 0)
        .select(
            "prev_type",
            n.cast("long").alias("n_transitions"),
            F.round(ent, 6).alias("entropy"),
            F.round(
                ent / F.lit(math.log(len(categories))), 6
            ).alias("norm_entropy"),
            F.round(F.exp(ent), 6).alias("perplexity"),
        )
    )
