"""Stream-static enrichment: join a live stream against dimension
tables — the single most common production streaming pattern (every
clickstream joins users, every order stream joins products).

Structured Streaming supports joining a streaming DataFrame to a batch
DataFrame natively: the static side is re-planned per micro-batch (so
a refreshed dim parquet is picked up on the next batch without
restarting the query), and a **broadcast** hint keeps the stream side
shuffle-free — the micro-batch flows map-side through the join, which
is the only acceptable shape at production rates. Left join preserves
events with no dim row yet (late dim arrival), flagged rather than
dropped.

Scale notes: the dim must fit the broadcast budget; for
larger-than-broadcast dims pre-bucket both sides on the key
(sources/bucketed.py) or demote to a stream-stream join with
watermarks. Never leave the join to a SortMergeJoin on the stream
side — that shuffles every micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
    matched_col: str = "dim_matched",
) -> DataFrame:
    """Join ``stream`` (streaming) to ``dim`` (static) on ``on``,
    broadcasting the dim. ``dim_cols`` prunes the dim projection
    (always include the key); a ``matched_col`` boolean marks rows that
    found a dim partner (meaningful for ``how='left'``)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left/inner, got {how!r}")
    cols = dim_cols if dim_cols is not None else dim.columns
    if on not in cols:
        cols = [on, *cols]
    d = dim.select(*dict.fromkeys(cols)).withColumn(
        "__dim_hit", F.lit(True)
    )
    out = stream.join(F.broadcast(d), on=on, how=how)
    return out.withColumn(
        matched_col, F.coalesce("__dim_hit", F.lit(False))
    ).drop("__dim_hit")
