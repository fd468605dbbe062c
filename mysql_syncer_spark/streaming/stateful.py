"""Stateful streaming operators: watermarked dedup + session windows.

Two extensions the batch engine's training-pipeline surface needs in
streaming form:

* :func:`dedup_stream` — exact dedup over a stream.
  ``dropDuplicatesWithinWatermark`` keys the state store on the dedup
  key and evicts entries once the watermark passes — bounded state, the
  streaming twin of dedup.dedup_exact (which would need the full
  history).
* :func:`sessionize_stream` — per-key session windows with a gap
  timeout, built on ``applyInPandasWithState``: the canonical "operator
  Spark lacks" escape hatch (arbitrary per-key state, Arrow-batched).
  The batch twin is queries.sessionize_events (LAG + gap threshold);
  the streaming version additionally needs event-time timeouts to emit
  a session whose user simply went away — exactly what the state store
  provides and a batch window cannot.

State size: one open session (3 scalars) per active key; closed
sessions are emitted and dropped. Watermark bounds both the dedup state
and the session timeout horizon, so state is evictable at 100 TB/day
stream rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: open-session state: (start_us, last_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.
    Exactly-once per key within the horizon; state evicted after it."""
    # NTZ-proof: parquet timestamps load as TIMESTAMP_NTZ on Spark 4.x
    # and withWatermark rejects NTZ event time.
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit CLOSED sessions ``(user_id, session_start, session_end,
    n_events)`` from an event stream: a session closes when a newer
    event arrives more than ``gap_minutes`` later, or when the watermark
    passes the open session's timeout (the user went away).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        # self-contained closure (executor Python workers import nothing
        # from this package): stdlib + pandas only
        import pandas as pd

        user = key[0]

        def session_row(start_us, last_us, n):
            return {
                "user_id": user,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
            }

        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append(session_row(start_us, last_us, n))
                state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(pdf["__ts_us"].tolist())
        ts_us.sort()
        if state.exists:
            start_us, last_us, n = state.get
            open_session = True
        else:
            start_us = last_us = n = 0
            open_session = False
        for t in ts_us:
            if not open_session:
                start_us, last_us, n = t, t, 1
                open_session = True
            elif t - last_us > gap_us:
                closed.append(session_row(start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        if open_session:
            state.update((start_us, last_us, n))
            # event-time timeout: fires once the watermark passes
            # last_event + gap (epoch millis). A LATE batch (events
            # behind the watermark) would compute a timeout in the past,
            # which Spark rejects — clamp to watermark+1s so the stale
            # session flushes at the next trigger instead of crashing.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_us // 1000 + gap_us // 1000, wm_ms + 1000)
            )
        if closed:
            yield pd.DataFrame(closed)

    prepped = (
        # NTZ-proof cast (see dedup_stream) before the watermark.
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(user_col),
            F.col(ts_col),
            (F.col(ts_col).cast("double") * 1_000_000).cast("long").alias(
                "__ts_us"
            ),
        )
    )
    return prepped.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

#: rolling history: the last `window` values as micro-units (value·1e6,
#: exact ints — the streaming mirror of the batch operator's DECIMAL(18,6)
#: accumulation, so both sides compute from identical exact sums)
_Z_STATE_SCHEMA = T.StructType(
    [T.StructField("hist_micro", T.ArrayType(T.LongType()))]
)


def anomaly_zscore_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 2.5,
    watermark: str = "10 minutes",
    idle_evict_minutes: int = 60,
) -> DataFrame:
    """Streaming rolling z-score anomaly detection — the stateful twin
    of operators/timeseries.rolling_zscore: every event is scored
    against its key's last ``window`` values, live, with
    ``applyInPandasWithState`` holding exactly those values (≤ window
    longs per active key — bounded state, no timeline rescan).

    The history is kept as micro-units (value·1e6 as exact int64), the
    streaming mirror of the batch operator's DECIMAL(18,6) sums: both
    sides derive mean/variance from identical exact integers, so an
    in-order replay of a batch through this operator yields the SAME
    zscores (pytest-gated, the rows-only analogue of an oracle).

    Ordering: events are scored in (ts, id) order *within* each
    micro-batch; a row arriving in a later batch than a timestamp-later
    row scores against the history as of its arrival (the unavoidable
    streaming/batch divergence — the watermark bounds how stale that
    can be).
    """
    if window < 1 or min_periods < 1:
        raise ValueError("window and min_periods must be >= 1")

    win, minp, thr = window, min_periods, threshold
    evict_us = idle_evict_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import math

        import pandas as pd

        user = key[0]
        # keys idle past the horizon are evicted (bounded total state
        # at any key cardinality — the same discipline as
        # transitions_stream/attribution_stream); a key restarting
        # after eviction scores against an empty history again.
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        rows = []
        for pdf in pdfs:
            for eid, ts_us, v in zip(
                pdf["__id"], pdf["__ts_us"], pdf["__value"]
            ):
                rows.append((int(ts_us), int(eid), float(v)))
        rows.sort()
        hist = list(state.get[0]) if state.exists else []
        out = []
        for ts_us, eid, v in rows:
            n = len(hist)
            z = None
            if n >= minp:
                s = sum(hist)            # exact int micro-units
                sq = sum(h * h for h in hist)  # exact int micro^2
                s_d, sq_d = s / 1e6, sq / 1e12
                var = (n * sq_d - s_d * s_d) / (n * (n - 1))
                if var > 0:
                    z = round((v - s_d / n) / math.sqrt(var), 6)
            out.append(
                {
                    "user_id": user,
                    "event_id": eid,
                    "ts": pd.Timestamp(ts_us, unit="us"),
                    "value": v,
                    "zscore": z,
                    "is_anomaly": bool(z is not None and abs(z) > thr),
                }
            )
            hist.append(int(round(v * 1e6)))
            if len(hist) > win:
                hist = hist[-win:]
        state.update((hist,))
        if rows:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(rows[-1][0] // 1000 + evict_us // 1000, wm_ms + 1000)
            )
        if out:
            yield pd.DataFrame(out)

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(id_col).cast("long").alias("__id"),
            (F.col(ts_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__ts_us"),
            F.col(value_col).cast("double").alias("__value"),
            F.col(ts_col),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_Z_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: last-seen event per key: (ts_us, tie id, type)
_TR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def transitions_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    idle_evict_minutes: int = 60,
) -> DataFrame:
    """Streaming twin of ``sequence.event_transitions``: emits one row
    per observed transition ``(key, prev_type, next_type, ts-of-next)``
    as events arrive — downstream a plain streaming groupBy count (or
    the E90 count-min maintainer) keeps the live matrix.

    State per key is exactly ONE event (3 scalars): the latest seen.
    Keys idle past ``idle_evict_minutes`` of event time are evicted via
    the state timeout — bounded state at any key cardinality. The
    deliberate semantic consequence: a transition spanning an idle gap
    longer than the eviction horizon is NOT emitted (the key restarts,
    session-scoped analysis semantics). An in-order replay whose gaps
    stay inside the horizon reproduces the batch twin's pair multiset
    exactly (pytest-gated, the rows-only analogue of an oracle).

    Ordering: within a micro-batch events are folded in (ts, id)
    order; across batches, arrival order stands in for event order
    (the unavoidable streaming/batch divergence — the watermark bounds
    how stale a late row can be).
    """
    evict_us = idle_evict_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        user = key[0]
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        rows = []
        for pdf in pdfs:
            for eid, ts_us, typ in zip(
                pdf["__id"], pdf["__ts_us"], pdf["__type"]
            ):
                rows.append((int(ts_us), int(eid), str(typ)))
        rows.sort()
        out = []
        if state.exists:
            last_us, last_id, last_type = state.get
        else:
            last_us, last_id, last_type = None, None, None
        for ts_us, eid, typ in rows:
            if last_type is not None:
                out.append(
                    {
                        "user_id": user,
                        "prev_type": last_type,
                        "next_type": typ,
                        "ts": pd.Timestamp(ts_us, unit="us"),
                    }
                )
            last_us, last_id, last_type = ts_us, eid, typ
        if last_type is not None:
            state.update((last_us, last_id, last_type))
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_us // 1000 + evict_us // 1000, wm_ms + 1000)
            )
        if out:
            yield pd.DataFrame(out)

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.col(id_col).alias("__id"),
            (F.col(ts_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__ts_us"),
            F.col(type_col).alias("__type"),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("conv_ts", T.TimestampType()),
        T.StructField("touch_type", T.StringType()),
        T.StructField("touch_ts", T.TimestampType()),
        T.StructField("micros_to_convert", T.LongType()),
    ]
)

#: latest touch per key: (ts_us, type); (0, "") = no touch yet
_ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("touch_us", T.LongType()),
        T.StructField("touch_type", T.StringType()),
    ]
)


def attribution_stream(
    stream: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    idle_evict_minutes: int = 60,
) -> DataFrame:
    """Streaming twin of ``sequence.attribute_conversions`` (last-touch
    model): emits one attributed row per conversion AS IT ARRIVES,
    holding only the key's latest touch (2 scalars) in state — the
    live campaign dashboard the batch operator backfills.

    Same state policy as :func:`transitions_stream`: keys idle past
    ``idle_evict_minutes`` of event time are evicted (a conversion
    after the horizon reports unattributed — session-scoped
    semantics). In-order replay inside the horizon reproduces the
    batch twin's rows exactly (pytest-gated)."""
    evict_us = idle_evict_minutes * 60 * 1_000_000
    touches = set(touch_types)

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        user = key[0]
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        rows = []
        for pdf in pdfs:
            for eid, ts_us, typ in zip(
                pdf["__id"], pdf["__ts_us"], pdf["__type"]
            ):
                rows.append((int(ts_us), int(eid), str(typ)))
        rows.sort()
        touch_us, touch_type = (
            state.get if state.exists else (None, None)
        )
        out = []
        for ts_us, eid, typ in rows:
            if typ == conversion_type:
                out.append(
                    {
                        "user_id": user,
                        "event_id": eid,
                        "conv_ts": pd.Timestamp(ts_us, unit="us"),
                        "touch_type": touch_type,
                        "touch_ts": (
                            pd.Timestamp(touch_us, unit="us")
                            if touch_us is not None
                            else None
                        ),
                        "micros_to_convert": (
                            ts_us - touch_us
                            if touch_us is not None
                            else None
                        ),
                    }
                )
            if typ in touches:
                touch_us, touch_type = ts_us, typ
        if touch_us is not None:
            state.update((touch_us, touch_type))
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(touch_us // 1000 + evict_us // 1000, wm_ms + 1000)
            )
        if out:
            yield pd.DataFrame(out)

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.col(id_col).alias("__id"),
            (F.col(ts_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__ts_us"),
            F.col(type_col).alias("__type"),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SESSION_PATH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("path", T.StringType()),
    ]
)

#: open session + its opening path: (start_us, last_us, n, first types)
_SP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("types", T.ArrayType(T.StringType())),
    ]
)


def session_paths_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    max_steps: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``sequence.session_paths``' per-session stage:
    emits each CLOSED session with the ``>``-joined path of its first
    ``max_steps`` event types — downstream a plain streaming count
    keeps the live top-paths table.

    State per key = one open session + at most ``max_steps`` type
    strings (the same deliberate truncation that bounds the batch
    operator's path domain bounds the streaming state); sessions close
    on the gap rule or on event-time timeout (user went away), exactly
    like :func:`sessionize_stream`. An in-order replay yields the same
    (path, count) multiset as the batch operator's per-session stage
    (pytest-gated)."""
    gap_us = gap_minutes * 60 * 1_000_000
    cap = max_steps

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        user = key[0]

        def row(start_us, last_us, n, types):
            return {
                "user_id": user,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
                "path": ">".join(types),
            }

        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, types = state.get
                closed.append(row(start_us, last_us, n, list(types)))
                state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return

        rows = []
        for pdf in pdfs:
            for eid, ts_us, typ in zip(
                pdf["__id"], pdf["__ts_us"], pdf["__type"]
            ):
                rows.append((int(ts_us), int(eid), str(typ)))
        rows.sort()
        if state.exists:
            start_us, last_us, n, types = state.get
            types = list(types)
            open_session = True
        else:
            start_us = last_us = n = 0
            types: list[str] = []
            open_session = False
        for ts_us, _eid, typ in rows:
            if not open_session:
                start_us, last_us, n, types = ts_us, ts_us, 1, [typ]
                open_session = True
            elif ts_us - last_us > gap_us:
                closed.append(row(start_us, last_us, n, types))
                start_us, last_us, n, types = ts_us, ts_us, 1, [typ]
            else:
                last_us, n = ts_us, n + 1
                if len(types) < cap:
                    types.append(typ)
        if open_session:
            state.update((start_us, last_us, n, types))
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_us // 1000 + gap_us // 1000, wm_ms + 1000)
            )
        if closed:
            yield pd.DataFrame(closed)

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.col(id_col).alias("__id"),
            (F.col(ts_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__ts_us"),
            F.col(type_col).alias("__type"),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_PATH_SCHEMA,
        stateStructType=_SP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_steps", T.IntegerType()),
        T.StructField("t_first", T.TimestampType()),
        T.StructField("t_last", T.TimestampType()),
        T.StructField("completed", T.BooleanType()),
    ]
)

#: greedy-funnel progress: stage timestamps (us), NULL-free prefix
_FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("stage_us", T.ArrayType(T.LongType()))]
)


def funnel_stream(
    stream: DataFrame,
    steps: "list[str]",
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    horizon_minutes: int = 120,
) -> DataFrame:
    """Streaming twin of the batch funnel cascade (operators/funnel.py):
    the greedy-earliest chain is INCREMENTAL by construction — each
    key's state is one timestamp per completed stage (the greedy
    prefix), and a new event can only extend it, never revise it
    (greedy prefix timestamps are minimal among valid chains over the
    events seen so far; with in-order arrival that is the batch
    cascade's exact invariant).

    Emission: a key emits ONCE — immediately when it completes the
    last step (live conversion signal), or at the event-time timeout
    ``horizon_minutes`` past its last progress (the abandoned-funnel
    cohort, with how far it got). Keys that never did step 0 never
    occupy state. State is <= len(steps) longs per active key.

    In-order replay reproduces the batch funnel's ``n_steps``/stage
    times for every emitted key (pytest-gated)."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    n_steps = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    evict_us = horizon_minutes * 60 * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        user = key[0]

        def row(stages, completed):
            return {
                "user_id": user,
                "n_steps": len(stages),
                "t_first": pd.Timestamp(stages[0], unit="us"),
                "t_last": pd.Timestamp(stages[-1], unit="us"),
                "completed": completed,
            }

        if state.hasTimedOut:
            out = []
            if state.exists:
                stages = [t for t in state.get[0]]
                if stages and stages[0] >= 0:  # not the completed mark
                    out.append(row(stages, False))
                state.remove()
            if out:
                yield pd.DataFrame(out)
            return

        rows = []
        for pdf in pdfs:
            for eid, ts_us, typ in zip(
                pdf["__id"], pdf["__ts_us"], pdf["__type"]
            ):
                rows.append((int(ts_us), int(eid), str(typ)))
        rows.sort()
        stages = list(state.get[0]) if state.exists else []
        finished = bool(stages) and stages[0] < 0
        done = []
        last_us = rows[-1][0] if rows else 0
        if not finished:
            for ts_us, _eid, typ in rows:
                i = step_idx.get(typ)
                if i is None:
                    continue
                if i == len(stages) and (i == 0 or ts_us > stages[-1]):
                    stages.append(ts_us)
                    if len(stages) == n_steps:
                        done.append(row(stages, True))
                        # completed sentinel: the key emits ONCE — later
                        # events must not restart a second funnel (the
                        # batch cascade counts one earliest chain per key)
                        stages = [-1]
                        finished = True
                        break
        if stages:
            state.update((stages,))
            wm_ms = state.getCurrentWatermarkMs()
            anchor = stages[-1] if not finished else last_us
            state.setTimeoutTimestamp(
                max(anchor // 1000 + evict_us // 1000, wm_ms + 1000)
            )
        if done:
            yield pd.DataFrame(done)

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.col(id_col).alias("__id"),
            (F.col(ts_col).cast("double") * 1_000_000)
            .cast("long")
            .alias("__ts_us"),
            F.col(type_col).alias("__type"),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: live twin of sketches.heavy_hitters (E122).
# ---------------------------------------------------------------------------

HH_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("dec", T.LongType()),
    ]
)

#: per-shard MG summary: parallel key/count arrays + cumulative
#: decrement + fold sequence number
_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("dec", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    key_col: str,
    capacity: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Live Misra-Gries maintenance — the streaming twin of
    ``sketches.heavy_hitters``: each micro-batch folds its rows into
    per-shard MG summaries (same compression rule as the batch
    ``mg_summaries``), and every fold RE-EMITS the shard's full current
    summary tagged with a monotone ``seq`` — so the latest ``seq`` per
    shard IS the live summary table, and a reader merges shards exactly
    like ``mg_merge`` merges partitions (est <= true <= est + total
    dec; exactness law when every shard stays under capacity).

    Keys hash-shard via the engine's md5 idiom (deterministic — a
    replay lands every key on the same shard), keys travel as strings
    (state schema is fixed; callers cast back). State per shard is <=
    capacity counters + 2 scalars and the group domain is the FIXED
    shard set — bounded state with NO timeout needed, unlike the
    per-key operators above whose key domain grows with the data
    (their eviction horizons don't apply here by construction).

    In-order replay equivalence (pytest-gated): under the exactness
    law the final per-shard summaries equal the exact GROUP-BY counts,
    which is also what the batch operator returns; in the approximate
    regime the MG invariants hold per shard against that shard's true
    counts.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        shard = key[0]
        if state.exists:
            keys, counts, dec, seq = state.get
            summary = dict(zip(keys, counts))
        else:
            summary, dec, seq = {}, 0, 0
        for pdf in pdfs:
            for k, n in pdf["__key"].value_counts().items():
                summary[k] = summary.get(k, 0) + int(n)
            if len(summary) > capacity:
                vals = sorted(summary.values(), reverse=True)
                cut = vals[capacity]
                summary = {
                    k: v - cut for k, v in summary.items() if v > cut
                }
                dec += cut
        seq += 1
        ks = sorted(summary)
        state.update((ks, [summary[k] for k in ks], dec, seq))
        yield pd.DataFrame(
            {
                "shard": [shard] * (len(ks) + 1),
                "seq": [seq] * (len(ks) + 1),
                "key": ks + [None],
                "est": [summary[k] for k in ks] + [0],
                "dec": [0] * len(ks) + [dec],
            }
        )

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hh-shard"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    prepped = (
        stream.where(F.col(key_col).isNotNull())
        .select(
            F.pmod(h, F.lit(n_shards)).cast("int").alias("__shard"),
            F.col(key_col).cast("string").alias("__key"),
        )
    )
    return prepped.groupBy("__shard").applyInPandasWithState(
        fold,
        outputStructType=HH_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
