"""Scalable interval join: points × time windows with NO equi key.

The one join shape Spark's hash machinery can't take directly: match
every point event to every interval that contains it, when nothing
else equates the two sides. Naively that plans as a
BroadcastNestedLoopJoin (or cartesian) — quadratic work and a
single-point-of-OOM at scale. The repo's other temporal joins dodge
this (the as-of join is a union-merge window, ``range_join_user_bursts``
rides its user_id equi key); this operator covers the remaining case:
global windows (maintenance, incidents, promotions) against a
global event stream.

**Bucket decomposition** — the standard MapReduce-era fix, same family
as the MinHash band trick: quantize time into ``bucket_seconds``-wide
buckets,

* a point belongs to exactly ONE bucket;
* an interval is exploded to every bucket it overlaps
  (``sequence(floor(start/w), floor(end/w))`` — row-local fan-out of
  ``span/width`` rows per interval);
* equi-join on the bucket id, then verify the exact containment
  predicate.

Because a point has a single bucket, every qualifying (point,
interval) pair meets exactly once — no dedup pass. The join is a plain
hash join on a well-distributed integer key; hot buckets (many windows
over the same hour) are ordinary hash skew, handled by AQE like any
other key. ``bucket_seconds`` trades explode fan-out (long intervals ÷
width) against bucket population; set it near the typical interval
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Inner-join each row of ``points`` to every row of ``intervals``
    whose ``[start_col, end_col)`` window contains ``ts_col``
    (``inclusive_end`` closes the right edge). Column sets must be
    disjoint; all columns of both sides are returned.

    Timestamps are compared on the epoch-seconds axis (sub-second
    precision preserved by the exact predicate; only the BUCKETING
    floors to seconds, which is safe because bucket membership is a
    superset test).
    """
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"point/interval column names must be disjoint, both have "
            f"{sorted(overlap)}"
        )

    def bucket(col: str):
        # NTZ can't cast to long directly (Spark 4 parquet loads
        # timestamps as TIMESTAMP_NTZ); routing through TIMESTAMP
        # shifts both sides by the same session-TZ offset, so bucket
        # membership and the exact predicate are unaffected
        return F.floor(
            F.col(col).cast("timestamp").cast("long") / F.lit(bucket_seconds)
        )

    p = points.withColumn("__bucket", bucket(ts_col))
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(start_col), bucket(end_col))),
    )
    ts, lo, hi = F.col(ts_col), F.col(start_col), F.col(end_col)
    upper = ts <= hi if inclusive_end else ts < hi
    return p.join(i, on="__bucket").where((ts >= lo) & upper).drop("__bucket")
