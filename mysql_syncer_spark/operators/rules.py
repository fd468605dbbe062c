"""Rule-funnel diagnostics: per-rule drop accounting in ONE pass.

Production curation pipelines (C4, Gopher, RefinedWeb, FineWeb) apply
an ordered cascade of keep/drop rules and publish, per rule, how many
documents reached it and how many it removed — the number that tells
you which filter is doing the work and which is dead weight. The
naive way materializes every stage boundary and counts it (N actions,
N cache/checkpoint barriers — what `pipeline.CurationReport` does for
its 4 coarse stages, at the cost of a `localCheckpoint` per stage).

This module computes the WHOLE funnel in one distributed action: each
row is labeled with the index of its first failing rule (a single
chained CASE — pure codegen, shuffle-free), one map-side-combinable
groupBy reduces to at most len(rules)+1 counter rows, and the
in/out/dropped ledger is derived on that rules-sized aggregate with a
window. At 100 TB the data-sized work is one scan + one tiny shuffle,
independent of how many rules the cascade has.

First-failing semantics match a short-circuiting cascade exactly: a
document dropped by rule i is not evaluated by (i.e., never counted
against) any later rule, so `n_in[i+1] = n_in[i] - n_dropped[i]` and
the last rule's `n_out` is the survivor count. A NULL rule verdict
counts as a failure (rules are keep-predicates; unknown is not keep).

Reference anchor: elevates the reference's per-table sync log counters
(Synchronizer.php:200-231 — inserted/updated/deleted tallies per unit)
to per-rule corpus accounting; the funnel shape itself is
training-pipeline surface beyond the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: rule name used for the synthetic "passed every rule" bucket
KEPT = "__kept__"


def first_failing_rule(
    df: DataFrame,
    rules: Sequence[tuple[str, Column]],
    idx_col: str = "first_failed_idx",
    name_col: str = "first_failed_rule",
) -> DataFrame:
    """Label every row with its first failing rule (short-circuit
    cascade order). Rows passing every rule get index ``len(rules)``
    and name ``None``. NULL verdicts fail. Pure codegen — no shuffle.
    """
    if not rules:
        raise ValueError("rules must be a non-empty ordered sequence")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    if KEPT in names:
        raise ValueError(f"rule name {KEPT!r} is reserved")
    expr = None
    for i, (_, cond) in enumerate(rules):
        fail = ~F.coalesce(cond.cast("boolean"), F.lit(False))
        expr = (
            F.when(fail, F.lit(i)) if expr is None else expr.when(fail, F.lit(i))
        )
    idx = expr.otherwise(F.lit(len(rules))).cast("long")
    name = F.element_at(
        F.array(*[F.lit(n) for n in names] + [F.lit(None).cast("string")]),
        (F.col(idx_col) + 1).cast("int"),
    )
    return df.withColumn(idx_col, idx).withColumn(name_col, name)


def rule_funnel(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> DataFrame:
    """The funnel ledger: one row per rule, in cascade order.

    Output: ``rule_idx`` (long), ``rule`` (string), ``n_in`` (rows
    that reached the rule), ``n_dropped`` (rows whose FIRST failure
    is the rule), ``n_out`` (= n_in - n_dropped; the last rule's
    n_out is the survivor count). Rules that drop nothing still get
    their row. One data-sized scan + one tiny groupBy; the ledger
    arithmetic runs on the <= len(rules)+1-row aggregate only.
    """
    marked = first_failing_rule(df, rules)
    counts = marked.groupBy("first_failed_idx").agg(
        F.count(F.lit(1)).alias("__n")
    )
    spark = df.sparkSession
    ledger = spark.createDataFrame(
        [(i, n) for i, (n, _) in enumerate(rules)] + [(len(rules), KEPT)],
        "rule_idx long, rule string",
    )
    joined = ledger.join(
        counts, ledger["rule_idx"] == counts["first_failed_idx"], "left"
    ).select("rule_idx", "rule", F.coalesce("__n", F.lit(0)).alias("__n"))
    # whole-ledger window: the frame is rules-sized, a single partition
    # is the POINT (never data-sized)
    all_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    before_w = Window.orderBy("rule_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        joined.withColumn("__total", F.sum("__n").over(all_w))
        .withColumn(
            "n_in",
            (F.col("__total") - F.coalesce(F.sum("__n").over(before_w), F.lit(0)))
            .cast("long"),
        )
        .where(F.col("rule") != KEPT)
        .select(
            "rule_idx",
            "rule",
            "n_in",
            F.col("__n").cast("long").alias("n_dropped"),
            (F.col("n_in") - F.col("__n")).cast("long").alias("n_out"),
        )
    )
