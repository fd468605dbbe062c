"""Watermarked stream-stream join: correlate two live streams within a
bounded event-time window — impressions↔clicks attribution, order↔
payment matching, request↔response latency pairing.

The Structured Streaming surface stream-static enrichment can't cover:
BOTH sides arrive continuously, so the engine must buffer each side's
rows in the state store until the other side's match can no longer
arrive. Two things bound that state, and both are mandatory here:

* a **watermark on each side** (how late a row may be), and
* an **event-time range predicate** tying the two sides' timestamps
  (how far apart matches may be).

Together they let Spark evict state deterministically: a left row is
held for ``max_delay + right watermark`` and then dropped — without
the range condition the state grows forever, which is why this helper
refuses to build the join without one. Outer joins additionally emit
the unmatched row once its window is provably closed (late-arrival
semantics the batch twin below oracle-checks).

The same join expressed over bounded frames (``join_events_batch``) is
the oracle-checkable batch twin — identical predicate, so the
streaming query's output over a drained file source must equal it
(asserted by the live-replay test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bounds(
    left_ts: str, right_ts: str, max_delay: str
) -> "F.Column":
    return (
        (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )


def join_streams_windowed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on ``on`` where the right event lands
    in ``[left_ts, left_ts + max_delay]``. Both sides get event-time
    watermarks (state eviction); column names apart from ``on`` must
    not collide. ``how`` ∈ inner/leftOuter — outer rows emit once the
    match window closes under the watermark."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner/leftOuter, got {how!r}")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"column collision beyond the join key: {sorted(overlap)} — "
            "rename one side (stream-stream joins can't disambiguate)"
        )
    lw = left.withColumn(
        left_ts, F.col(left_ts).cast("timestamp")
    ).withWatermark(left_ts, watermark)
    rw = right.withColumn(
        right_ts, F.col(right_ts).cast("timestamp")
    ).withWatermark(right_ts, watermark)
    cond = (lw[on] == rw[on]) & _bounds(left_ts, right_ts, max_delay)
    joined = lw.join(rw, on=cond, how=how)
    # keep ONE copy of the key (both sides carry it after an expr join)
    return joined.drop(rw[on])


def join_events_batch(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    max_delay: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """The bounded twin of :func:`join_streams_windowed` — identical
    predicate over batch frames, used as the oracle for the streaming
    output (and useful on its own as a plain interval-bounded key
    join; for the equi-key-FREE variant see operators/interval.py)."""
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    cond = (l[on] == r[on]) & _bounds(left_ts, right_ts, max_delay)
    return l.join(r, on=cond, how=how).drop(r[on])
