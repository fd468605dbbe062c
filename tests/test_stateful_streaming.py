"""Stateful streaming: watermarked dedup + applyInPandasWithState
sessionization, driven by a chunked file source (deterministic replay,
real streaming machinery)."""

import os
import time

import pytest
from pyspark.sql import types as T

from mysql_syncer_spark.streaming.stateful import dedup_stream, sessionize_stream

#: e2e streaming (real micro-batch triggers + checkpoint dirs):
#: the nightly slow tier (VERDICT r12 item 2); see tests/slow_tier.txt
pytestmark = pytest.mark.slow


def _write_ordered(src, contents):
    """Write arrival files with strictly increasing mtimes — the file
    source orders batches by modification time, and equal-second mtimes
    would make arrival order (and thus watermark progression)
    nondeterministic."""
    base = time.time() - len(contents) * 10
    for i, (name, text) in enumerate(contents):
        p = src / name
        p.write_text(text)
        os.utime(p, (base + i * 10, base + i * 10))

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _run_to_memory(df, name, ckpt):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_dedup_stream_drops_cross_batch_dups(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"user_id": 1, "ts": "2026-01-01T10:00:00", "payload": "a"}\n'
        '{"user_id": 1, "ts": "2026-01-01T10:00:00", "payload": "a"}\n'
        '{"user_id": 2, "ts": "2026-01-01T10:01:00", "payload": "b"}\n'
    )
    (src / "b1.json").write_text(
        # same key again in a later microbatch, inside the watermark
        '{"user_id": 1, "ts": "2026-01-01T10:02:00", "payload": "a2"}\n'
        '{"user_id": 3, "ts": "2026-01-01T10:03:00", "payload": "c"}\n'
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = dedup_stream(stream, ["user_id"], "ts", watermark="1 hour")
    _run_to_memory(out, "dedup_out", str(tmp_path / "ckpt"))
    rows = spark.sql("select user_id from dedup_out").collect()
    got = sorted(r["user_id"] for r in rows)
    assert got == [1, 2, 3]  # each key exactly once within the horizon


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    """User 1 has two bursts 2h apart: burst A closes when burst B's
    first event arrives (gap rule); burst B closes when the watermark
    passes its timeout (the user went away) — driven by later sentinel
    events from another user."""
    src = tmp_path / "in"
    src.mkdir()
    _write_ordered(
        src,
        [
            (
                "b0.json",
                '{"user_id": 1, "ts": "2026-01-01T10:00:00", "payload": "x"}\n'
                '{"user_id": 1, "ts": "2026-01-01T10:10:00", "payload": "x"}\n'
                '{"user_id": 1, "ts": "2026-01-01T10:20:00", "payload": "x"}\n',
            ),
            ("b1.json", '{"user_id": 1, "ts": "2026-01-01T12:00:00", "payload": "x"}\n'),
            ("b2.json", '{"user_id": 99, "ts": "2026-01-01T20:00:00", "payload": "wm"}\n'),
            ("b3.json", '{"user_id": 99, "ts": "2026-01-01T23:00:00", "payload": "wm"}\n'),
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = sessionize_stream(
        stream, gap_minutes=30, watermark="10 minutes"
    )
    _run_to_memory(out, "sessions_out", str(tmp_path / "ckpt"))
    rows = spark.sql(
        "select * from sessions_out where user_id = 1 order by session_start"
    ).collect()
    assert len(rows) == 2, rows
    a, b = rows
    assert a["n_events"] == 3
    assert a["session_start"].minute == 0 and a["session_end"].minute == 20
    assert b["n_events"] == 1
    assert b["session_start"].hour == 12


ANOM_IN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class TestAnomalyZscoreStream:
    def _run(self, spark, tmp_path, batches, **kw):
        from mysql_syncer_spark.streaming.stateful import (
            anomaly_zscore_stream,
        )

        src = tmp_path / "anom_in"
        src.mkdir()
        _write_ordered(src, batches)
        stream = (
            spark.readStream.schema(ANOM_IN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        scored = anomaly_zscore_stream(stream, **kw)
        _run_to_memory(scored, "anom_out", str(tmp_path / "anom_ck"))
        return {r.event_id: r for r in spark.table("anom_out").collect()}

    @staticmethod
    def _lines(rows):
        return "\n".join(
            f'{{"user_id": {u}, "event_id": {e}, '
            f'"ts": "2026-01-01T10:{m:02d}:00", "value": {v}}}'
            for u, e, m, v in rows
        )

    def test_matches_batch_twin_on_in_order_replay(self, spark, tmp_path):
        """An in-order replay must yield the batch operator's zscores —
        the rows-only analogue of the oracle gate (both sides compute
        from identical exact micro-unit sums)."""
        import datetime as dt

        from mysql_syncer_spark.operators.timeseries import rolling_zscore

        vals = [10.25, 11.5, 9.75, 10.0, 12.25, 10.5, 55.5, 10.75,
                9.5, 11.0]
        rows = [(1, i, i, vals[i]) for i in range(10)]
        # two batches, split mid-stream, arriving in event order
        got = self._run(
            spark, tmp_path,
            [("b0.json", self._lines(rows[:6])),
             ("b1.json", self._lines(rows[6:]))],
            window=5, min_periods=3, threshold=2.0,
        )
        t0 = dt.datetime(2026, 1, 1, 10, 0)
        batch_in = spark.createDataFrame(
            [
                (1, i, t0 + dt.timedelta(minutes=i), vals[i])
                for i in range(10)
            ],
            "user_id long, event_id long, ts timestamp, value double",
        )
        want = {
            r.event_id: r
            for r in rolling_zscore(
                batch_in, "user_id", ["ts", "event_id"], "value",
                window=5, min_periods=3, threshold=2.0,
            ).collect()
        }
        assert set(got) == set(want)
        for eid in want:
            assert got[eid].zscore == want[eid].zscore, eid
            assert got[eid].is_anomaly == want[eid].is_anomaly, eid
        assert got[6].is_anomaly  # the planted spike fired

    def test_state_bounded_to_window(self, spark, tmp_path):
        """History beyond the window must be forgotten: a level shift
        `window` events ago no longer influences the score."""
        rows_a = [(1, i, i, 1000.0) for i in range(4)]      # old regime
        rows_b = [(1, 4 + i, 4 + i, 10.0 + 0.25 * i) for i in range(8)]
        probe = [(1, 12, 12, 10.9)]
        got = self._run(
            spark, tmp_path,
            [("b0.json", self._lines(rows_a + rows_b)),
             ("b1.json", self._lines(probe))],
            window=6, min_periods=3, threshold=3.0,
        )
        # probe's window holds only new-regime values — unremarkable
        assert not got[12].is_anomaly
        assert abs(got[12].zscore) < 3.0

    def test_validation(self, spark, tmp_path):
        import pytest as _pytest

        from mysql_syncer_spark.streaming.stateful import (
            anomaly_zscore_stream,
        )

        src_dir = tmp_path / "anom_val_in"
        src_dir.mkdir()
        stream = spark.readStream.schema(ANOM_IN_SCHEMA).json(str(src_dir))
        with _pytest.raises(ValueError):
            anomaly_zscore_stream(stream, window=0)


class TestTransitionsStream:
    SCHEMA = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    @staticmethod
    def _line(uid, eid, ts, typ):
        return (
            f'{{"user_id": {uid}, "event_id": {eid}, '
            f'"ts": "{ts}", "event_type": "{typ}"}}\n'
        )

    def _run(self, spark, tmp_path, batches, **kw):
        from mysql_syncer_spark.streaming.stateful import transitions_stream

        src = tmp_path / "tr_in"
        src.mkdir()
        _write_ordered(src, batches)
        stream = (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        out = transitions_stream(stream, **kw)
        _run_to_memory(out, "transitions_out", str(tmp_path / "tr_ck"))
        return spark.sql("select * from transitions_out").collect()

    def test_matches_batch_twin_on_in_order_replay(self, spark, tmp_path):
        """Cross-batch carry: the last event of batch 0 pairs with the
        first event of batch 1; counts equal the batch operator's."""
        from mysql_syncer_spark.operators.sequence import event_transitions

        b0 = (
            self._line(1, 10, "2026-01-01T10:00:00", "view")
            + self._line(1, 11, "2026-01-01T10:01:00", "click")
            + self._line(2, 20, "2026-01-01T10:00:30", "view")
        )
        b1 = (
            self._line(1, 12, "2026-01-01T10:02:00", "buy")
            + self._line(2, 21, "2026-01-01T10:03:00", "buy")
            + self._line(3, 30, "2026-01-01T10:04:00", "view")
        )
        rows = self._run(spark, tmp_path, [("b0.json", b0), ("b1.json", b1)])
        got = sorted(
            (r["user_id"], r["prev_type"], r["next_type"]) for r in rows
        )
        assert got == sorted(
            [(1, "view", "click"), (1, "click", "buy"), (2, "view", "buy")]
        )
        # batch twin over the union agrees on the pair multiset
        import datetime as dt

        batch = spark.createDataFrame(
            [
                (10, 1, dt.datetime(2026, 1, 1, 10, 0, 0), "view"),
                (11, 1, dt.datetime(2026, 1, 1, 10, 1, 0), "click"),
                (20, 2, dt.datetime(2026, 1, 1, 10, 0, 30), "view"),
                (12, 1, dt.datetime(2026, 1, 1, 10, 2, 0), "buy"),
                (21, 2, dt.datetime(2026, 1, 1, 10, 3, 0), "buy"),
                (30, 3, dt.datetime(2026, 1, 1, 10, 4, 0), "view"),
            ],
            "event_id long, user_id long, ts timestamp, event_type string",
        )
        twin = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in event_transitions(
                batch, "user_id", "ts", "event_type", "event_id"
            ).collect()
        }
        stream_counts = {}
        for _, p, n in got:
            stream_counts[(p, n)] = stream_counts.get((p, n), 0) + 1
        assert stream_counts == twin

    def test_within_batch_order_is_event_time(self, spark, tmp_path):
        """Out-of-order rows INSIDE one batch are folded by (ts, id)."""
        b0 = (
            self._line(1, 11, "2026-01-01T10:01:00", "click")
            + self._line(1, 10, "2026-01-01T10:00:00", "view")
        )
        rows = self._run(spark, tmp_path, [("b0.json", b0)])
        assert [(r["prev_type"], r["next_type"]) for r in rows] == [
            ("view", "click")
        ]


class TestAttributionStream:
    SCHEMA = TestTransitionsStream.SCHEMA
    _line = staticmethod(TestTransitionsStream._line)

    def _run(self, spark, tmp_path, batches, **kw):
        from mysql_syncer_spark.streaming.stateful import attribution_stream

        src = tmp_path / "at_in"
        src.mkdir()
        _write_ordered(src, batches)
        stream = (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        out = attribution_stream(
            stream, conversion_type="buy", touch_types=["view", "click"],
            **kw,
        )
        _run_to_memory(out, "attr_out", str(tmp_path / "at_ck"))
        return spark.sql("select * from attr_out").collect()

    def test_matches_batch_twin_on_in_order_replay(self, spark, tmp_path):
        """Touch in batch 0 attributes a conversion in batch 1; an
        unattributed conversion reports NULLs; rows equal the batch
        operator's."""
        import datetime as dt

        from mysql_syncer_spark.operators.sequence import (
            attribute_conversions,
        )

        b0 = (
            self._line(1, 10, "2026-01-01T10:00:00", "view")
            + self._line(1, 11, "2026-01-01T10:01:00", "click")
            + self._line(2, 20, "2026-01-01T10:00:30", "buy")
        )
        b1 = (
            self._line(1, 12, "2026-01-01T10:02:00", "buy")
            + self._line(1, 13, "2026-01-01T10:03:00", "buy")
        )
        rows = self._run(spark, tmp_path, [("b0.json", b0), ("b1.json", b1)])
        got = {
            r["event_id"]: (
                r["touch_type"], r["touch_ts"], r["micros_to_convert"]
            )
            for r in rows
        }
        assert got[20] == (None, None, None)          # no prior touch
        t1 = dt.datetime(2026, 1, 1, 10, 1, 0)
        assert got[12] == ("click", t1, 60_000_000)
        # no new touch between the two buys: same attribution carries
        assert got[13] == ("click", t1, 120_000_000)

        batch = spark.createDataFrame(
            [
                (10, 1, dt.datetime(2026, 1, 1, 10, 0, 0), "view"),
                (11, 1, dt.datetime(2026, 1, 1, 10, 1, 0), "click"),
                (20, 2, dt.datetime(2026, 1, 1, 10, 0, 30), "buy"),
                (12, 1, dt.datetime(2026, 1, 1, 10, 2, 0), "buy"),
                (13, 1, dt.datetime(2026, 1, 1, 10, 3, 0), "buy"),
            ],
            "event_id long, user_id long, ts timestamp, event_type string",
        )
        twin = {
            r["event_id"]: (
                r["touch_type"], r["touch_ts"], r["micros_to_convert"]
            )
            for r in attribute_conversions(
                batch, "user_id", "ts", "event_type", "event_id",
                conversion_type="buy", touch_types=["view", "click"],
                model="last",
            ).collect()
        }
        assert got == twin


class TestSessionPathsStream:
    SCHEMA = TestTransitionsStream.SCHEMA
    _line = staticmethod(TestTransitionsStream._line)

    def _run(self, spark, tmp_path, batches, **kw):
        from mysql_syncer_spark.streaming.stateful import (
            session_paths_stream,
        )

        src = tmp_path / "sp_in"
        src.mkdir()
        _write_ordered(src, batches)
        stream = (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        out = session_paths_stream(stream, **kw)
        _run_to_memory(out, "sp_out", str(tmp_path / "sp_ck"))
        return spark.sql("select * from sp_out").collect()

    def test_gap_close_carries_path_and_truncates(self, spark, tmp_path):
        """A session spanning two micro-batches closes with the path of
        its FIRST max_steps events; the follow-up session flushes via
        the watermark timeout."""
        b0 = (
            self._line(1, 10, "2026-01-01T10:00:00", "a")
            + self._line(1, 11, "2026-01-01T10:01:00", "b")
        )
        b1 = (
            # same session continues (gap < 30 min), 2 more events:
            # truncation at max_steps=3 drops the 4th
            self._line(1, 12, "2026-01-01T10:02:00", "c")
            + self._line(1, 13, "2026-01-01T10:03:00", "d")
            # 65-min gap: closes session 1
            + self._line(1, 14, "2026-01-01T11:08:00", "e")
        )
        # watermark pusher: a later event on ANOTHER key advances the
        # global watermark far enough to time out user 1's open session
        b2 = self._line(2, 20, "2026-01-01T13:00:00", "x")
        rows = self._run(
            spark, tmp_path,
            [("b0.json", b0), ("b1.json", b1), ("b2.json", b2)],
            gap_minutes=30, max_steps=3,
        )
        got = {(r["user_id"], r["path"]): r["n_events"] for r in rows}
        assert got[(1, "a>b>c")] == 4     # 4 events, path truncated to 3
        assert (1, "e") in got            # flushed by timeout
        assert got[(1, "e")] == 1

    def test_matches_batch_per_session_stage(self, spark, tmp_path):
        """In-order replay: closed-session (path, count) multiset equals
        the batch operator's per-session stage."""
        import collections

        from mysql_syncer_spark.operators.sequence import session_paths

        lines = []
        import datetime as dt

        batch_rows = []
        eid = 0
        for uid, mins, typ in [
            (1, 0, "a"), (1, 1, "b"),
            (1, 65, "a"), (1, 66, "b"),
            (2, 0, "a"), (2, 1, "c"),
        ]:
            ts = dt.datetime(2026, 1, 1, 10, 0) + dt.timedelta(minutes=mins)
            lines.append(self._line(uid, eid, ts.isoformat(), typ))
            batch_rows.append((eid, uid, ts, typ))
            eid += 1
        # watermark pusher closes everything
        pusher = self._line(9, 99, "2026-01-02T10:00:00", "z")
        rows = self._run(
            spark, tmp_path,
            [("b0.json", "".join(lines)), ("b1.json", pusher)],
            gap_minutes=30, max_steps=5,
        )
        stream_counts = collections.Counter(
            r["path"] for r in rows if r["user_id"] != 9
        )
        batch = spark.createDataFrame(
            batch_rows,
            "event_id long, user_id long, ts timestamp, event_type string",
        )
        twin = {
            r["path"]: r["n_sessions"]
            for r in session_paths(
                batch, "user_id", "ts", "event_type", "event_id",
                gap="30 MINUTE", max_steps=5, top_k=100,
            ).collect()
        }
        assert dict(stream_counts) == twin


class TestFunnelStream:
    SCHEMA = TestTransitionsStream.SCHEMA
    _line = staticmethod(TestTransitionsStream._line)

    def _run(self, spark, tmp_path, batches, **kw):
        from mysql_syncer_spark.streaming.stateful import funnel_stream

        src = tmp_path / "fn_in"
        src.mkdir()
        _write_ordered(src, batches)
        stream = (
            spark.readStream.schema(self.SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        out = funnel_stream(
            stream, steps=["view", "click", "buy"], **kw
        )
        _run_to_memory(out, "fn_out", str(tmp_path / "fn_ck"))
        return spark.sql("select * from fn_out").collect()

    def test_completion_abandonment_and_replay_twin(self, spark, tmp_path):
        import datetime as dt

        from mysql_syncer_spark.operators.funnel import funnel

        b0 = (
            # user 1 completes across batches
            self._line(1, 10, "2026-01-01T10:00:00", "view")
            + self._line(1, 11, "2026-01-01T10:01:00", "click")
            # user 2 gets one step then goes away
            + self._line(2, 20, "2026-01-01T10:00:30", "view")
            # user 3's buy BEFORE view never counts as progress
            + self._line(3, 30, "2026-01-01T10:00:00", "buy")
        )
        b1 = (
            self._line(1, 12, "2026-01-01T10:02:00", "buy")
            # user 1 again AFTER completion: must NOT restart a funnel
            + self._line(1, 13, "2026-01-01T10:03:00", "view")
        )
        # watermark pusher far past the 120-min horizon flushes user 2
        b2 = self._line(9, 99, "2026-01-02T10:00:00", "z")
        rows = self._run(
            spark, tmp_path,
            [("b0.json", b0), ("b1.json", b1), ("b2.json", b2)],
            horizon_minutes=120,
        )
        got = {r["user_id"]: r for r in rows if r["user_id"] != 9}
        assert got[1]["completed"] is True and got[1]["n_steps"] == 3
        assert got[1]["t_first"] == dt.datetime(2026, 1, 1, 10, 0, 0)
        assert got[1]["t_last"] == dt.datetime(2026, 1, 1, 10, 2, 0)
        # exactly ONE row for user 1 despite the post-completion view
        assert sum(1 for r in rows if r["user_id"] == 1) == 1
        # user 2 flushed as abandoned with 1 step
        assert got[2]["completed"] is False and got[2]["n_steps"] == 1
        # user 3 never entered (buy isn't step 0) -> no row
        assert 3 not in got

        # batch twin agrees on n_steps and stage times for emitted keys
        batch = spark.createDataFrame(
            [
                (10, 1, dt.datetime(2026, 1, 1, 10, 0, 0), "view"),
                (11, 1, dt.datetime(2026, 1, 1, 10, 1, 0), "click"),
                (20, 2, dt.datetime(2026, 1, 1, 10, 0, 30), "view"),
                (30, 3, dt.datetime(2026, 1, 1, 10, 0, 0), "buy"),
                (12, 1, dt.datetime(2026, 1, 1, 10, 2, 0), "buy"),
                (13, 1, dt.datetime(2026, 1, 1, 10, 3, 0), "view"),
            ],
            "event_id long, user_id long, ts timestamp, event_type string",
        )
        twin = {
            r["user_id"]: r
            for r in funnel(
                batch, "user_id", "ts", "event_type",
                ["view", "click", "buy"],
            ).collect()
        }
        for uid, r in got.items():
            assert r["n_steps"] == twin[uid]["n_steps"]
            assert r["t_first"] == twin[uid]["t0"]


# ---------------------------------------------------------------------------
# streaming heavy hitters (E123): live MG maintenance
# ---------------------------------------------------------------------------

HH_IN_SCHEMA = T.StructType([T.StructField("k", T.StringType())])


def _hh_replay(spark, tmp_path, batches, capacity, n_shards, name):
    from mysql_syncer_spark.streaming.stateful import heavy_hitters_stream

    src = tmp_path / f"in_{name}"
    src.mkdir()
    _write_ordered(
        src,
        [
            (f"b{i}.json", "".join(f'{{"k": "{k}"}}\n' for k in ks))
            for i, ks in enumerate(batches)
        ],
    )
    stream = (
        spark.readStream.schema(HH_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = heavy_hitters_stream(stream, "k", capacity=capacity, n_shards=n_shards)
    _run_to_memory(out, name, str(tmp_path / f"ckpt_{name}"))
    rows = spark.sql(f"select * from {name}").collect()
    # live summary = max-seq emission per shard
    latest = {}
    for r in rows:
        latest.setdefault(r["shard"], []).append(r)
    final = {}
    decs = {}
    for shard, rs in latest.items():
        top = max(r["seq"] for r in rs)
        for r in rs:
            if r["seq"] != top:
                continue
            if r["key"] is None:
                decs[shard] = r["dec"]
            else:
                final[r["key"]] = final.get(r["key"], 0) + r["est"]
    return final, decs


def test_heavy_hitters_stream_exactness_matches_batch(spark, tmp_path):
    """Capacity above every shard's distinct count: the final live
    summaries ARE the exact counts — the same exactness law the batch
    operator's oracle runs under; cross-batch accumulation included."""
    from collections import Counter

    b0 = ["a"] * 5 + ["b"] * 3 + ["c"]
    b1 = ["a"] * 2 + ["c"] * 4 + ["d"]
    final, decs = _hh_replay(
        spark, tmp_path, [b0, b1], capacity=100, n_shards=2,
        name="hh_exact",
    )
    assert final == dict(Counter(b0 + b1))
    assert all(d == 0 for d in decs.values())


def test_heavy_hitters_stream_approx_invariants(spark, tmp_path):
    """Capacity 2 on a skewed stream: MG bounds hold per shard and the
    dominant key survives cross-batch compression."""
    from collections import Counter

    b0 = ["h"] * 30 + [f"t{i}" for i in range(6)]
    b1 = ["h"] * 20 + [f"u{i}" for i in range(6)]
    final, decs = _hh_replay(
        spark, tmp_path, [b0, b1], capacity=2, n_shards=1,
        name="hh_approx",
    )
    true = Counter(b0 + b1)
    dec = decs[list(decs)[0]]
    assert dec > 0  # compression really fired
    for k, est in final.items():
        assert est <= true[k] <= est + dec, (k, est, true[k], dec)
    assert "h" in final  # true count 50 >> N/(capacity+1) = 62/3


class TestWatermarkBoundaries:
    """The eviction EDGES (round-8 ask): staged watermark advances where
    evicted-then-reappearing keys, horizon-EQUAL timestamps, and
    duplicate batches behind the watermark must match the documented
    semantics — transitions restart silently across an evicted gap, the
    session gap rule is strictly ``>``, and late replays are bounded by
    the watermark (at-least-once sources can't double-count)."""

    SCHEMA = TestTransitionsStream.SCHEMA
    _line = staticmethod(TestTransitionsStream._line)

    def _run_tr(self, spark, tmp_path, batches, **kw):
        return TestTransitionsStream._run(
            self, spark, tmp_path, batches, **kw
        )

    def _run_sp(self, spark, tmp_path, batches, **kw):
        return TestSessionPathsStream._run(
            self, spark, tmp_path, batches, **kw
        )

    def test_transitions_evicted_key_restarts_without_cross_pair(
        self, spark, tmp_path
    ):
        """Key 1 idles past the eviction horizon (watermark advanced by
        sentinel key 99 between its events): the documented semantic is
        a silent RESTART — no pair spanning the evicted gap, while
        pairs within the post-restart batch still emit."""
        batches = [
            ("b0.json", self._line(1, 10, "2026-01-01T10:00:00", "view")
             + self._line(99, 90, "2026-01-01T10:00:00", "x")),
            # advances watermark source; next batch's wm = 11:50
            ("b1.json", self._line(99, 91, "2026-01-01T12:00:00", "x")),
            # wm 11:50 > key 1 timeout (10:00 + 60 min) -> evicted here
            ("b2.json", self._line(99, 92, "2026-01-01T12:01:00", "x")),
            ("b3.json", self._line(1, 11, "2026-01-01T12:30:00", "click")
             + self._line(1, 12, "2026-01-01T12:31:00", "buy")),
        ]
        rows = self._run_tr(
            spark, tmp_path, batches,
            watermark="10 minutes", idle_evict_minutes=60,
        )
        pairs = [(r["prev_type"], r["next_type"]) for r in rows
                 if r["user_id"] == 1]
        assert ("view", "click") not in pairs   # gap spans the eviction
        assert ("click", "buy") in pairs        # post-restart pair

    def test_transitions_horizon_equal_gap_still_pairs(
        self, spark, tmp_path
    ):
        """An event arriving EXACTLY idle_evict_minutes after the last
        one pairs normally as long as the watermark has not passed the
        timeout — eviction is watermark-driven, not gap-driven."""
        batches = [
            ("b0.json", self._line(1, 10, "2026-01-01T10:00:00", "view")),
            ("b1.json", self._line(1, 11, "2026-01-01T11:00:00", "click")),
            ("b2.json", self._line(99, 90, "2026-01-01T14:00:00", "x")),
        ]
        rows = self._run_tr(
            spark, tmp_path, batches,
            watermark="10 minutes", idle_evict_minutes=60,
        )
        pairs = [(r["prev_type"], r["next_type"]) for r in rows
                 if r["user_id"] == 1]
        assert pairs == [("view", "click")]

    def test_transitions_late_duplicate_batch_is_dropped(
        self, spark, tmp_path
    ):
        """A duplicate of an old batch re-delivered BEHIND the watermark
        (at-least-once source replay after eviction) is filtered by the
        watermark — the pair multiset does not double-count."""
        b0 = (self._line(1, 10, "2026-01-01T10:00:00", "view")
              + self._line(1, 11, "2026-01-01T10:01:00", "click"))
        batches = [
            ("b0.json", b0),
            ("b1.json", self._line(99, 90, "2026-01-01T13:00:00", "x")),
            ("b2.json", self._line(99, 91, "2026-01-01T13:01:00", "x")),
            ("b3.json", b0),  # replayed duplicate, 3h behind watermark
            ("b4.json", self._line(99, 92, "2026-01-01T13:02:00", "x")),
        ]
        rows = self._run_tr(
            spark, tmp_path, batches,
            watermark="10 minutes", idle_evict_minutes=60,
        )
        pairs = [(r["prev_type"], r["next_type"]) for r in rows
                 if r["user_id"] == 1]
        assert pairs == [("view", "click")]  # exactly once, not twice

    def test_session_gap_exactly_equal_continues_strictly_greater_closes(
        self, spark, tmp_path
    ):
        """The gap rule is strictly ``>``: an event exactly gap_minutes
        after the last CONTINUES the session; one second more CLOSES
        it."""
        b0 = (
            self._line(1, 10, "2026-01-01T10:00:00", "a")
            + self._line(1, 11, "2026-01-01T10:30:00", "b")   # == gap
            + self._line(1, 12, "2026-01-01T11:00:01", "c")   # gap + 1s
        )
        b1 = self._line(99, 90, "2026-01-01T14:00:00", "x")
        b2 = self._line(99, 91, "2026-01-01T14:01:00", "x")
        rows = self._run_sp(
            spark, tmp_path, [("b0.json", b0), ("b1.json", b1),
                              ("b2.json", b2)],
            gap_minutes=30, max_steps=5, watermark="10 minutes",
        )
        got = sorted(
            (r["path"], r["n_events"]) for r in rows if r["user_id"] == 1
        )
        assert got == [("a>b", 2), ("c", 1)]

    def test_session_evicted_key_reopens_fresh_session(
        self, spark, tmp_path
    ):
        """A key whose open session was flushed by the event-time
        timeout starts a FRESH session when it reappears — paths are
        never merged across an eviction."""
        batches = [
            ("b0.json", self._line(1, 10, "2026-01-01T10:00:00", "a")),
            ("b1.json", self._line(99, 90, "2026-01-01T12:00:00", "x")),
            # wm 11:50 > session timeout 10:30 -> "a" flushed here
            ("b2.json", self._line(99, 91, "2026-01-01T12:01:00", "x")),
            ("b3.json", self._line(1, 11, "2026-01-01T12:30:00", "b")),
            ("b4.json", self._line(99, 92, "2026-01-01T15:00:00", "x")),
            ("b5.json", self._line(99, 93, "2026-01-01T15:01:00", "x")),
        ]
        rows = self._run_sp(
            spark, tmp_path, batches,
            gap_minutes=30, max_steps=5, watermark="10 minutes",
        )
        got = sorted(
            (r["path"], r["n_events"]) for r in rows if r["user_id"] == 1
        )
        assert got == [("a", 1), ("b", 1)]
