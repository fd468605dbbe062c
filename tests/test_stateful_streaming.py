"""Stateful streaming: watermarked dedup + applyInPandasWithState
sessionization, driven by a chunked file source (deterministic replay,
real streaming machinery)."""

import os
import time

import pytest
from pyspark.sql import types as T

from mysql_syncer_spark.streaming.stateful import dedup_stream, sessionize_stream


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
