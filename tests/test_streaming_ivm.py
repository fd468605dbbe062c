"""Streaming materialized-join maintenance (streaming/ivm.py): the
laws are (1) REFRESH EQUIVALENCE per micro-batch — after replaying
the delta files the view equals the full recompute of the folded fact
table joined to the dimension; (2) EXACT replay convergence — a crash
in the replay window (after the view swap, before the checkpoint
commit) followed by a restart leaves the view EQUAL to the
uninterrupted run (keyed delta application is idempotent, unlike the
CMS maintainer's drift-HIGH contract)."""

import pytest
from pyspark.sql import types as T

from mysql_syncer_spark.streaming.ivm import ivm_bootstrap, ivm_join_stream

DELTA_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.LongType()),
        T.StructField("ck", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("op", T.StringType()),
    ]
)

B0 = (
    '{"ok": 2, "ck": 20, "price": 7.5, "op": "upsert"}\n'   # FK move
    '{"ok": 5, "ck": 40, "price": 2.0, "op": "upsert"}\n'   # insert
    '{"ok": 3, "ck": 0, "price": 0.0, "op": "delete"}\n'
)
B1 = (
    '{"ok": 5, "ck": 10, "price": 2.5, "op": "upsert"}\n'   # move again
    '{"ok": 1, "ck": 0, "price": 0.0, "op": "delete"}\n'
)


def _setup(spark, tmp_path, tag):
    a = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 9.0), (4, 30, 1.0)],
        "ok long, ck long, price double",
    )
    b = spark.createDataFrame(
        [(10, "ten"), (20, "twenty"), (40, "forty")], "ck long, name string"
    )
    b_path = str(tmp_path / f"dim_{tag}.parquet")
    b.write.parquet(b_path)
    mat_path = str(tmp_path / f"mat_{tag}.parquet")
    ivm_bootstrap(a, b, "ck", mat_path)
    src = tmp_path / f"in_{tag}"
    src.mkdir()
    return mat_path, b_path, src


def _view(spark, mat_path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(mat_path)
        .select("ck", "ok", "price", "name")
        .collect()
    )

#: recompute of A ⊕ B0 ⊕ B1 joined to the dimension
FINAL = sorted(
    [
        (10, 5, 2.5, "ten"),     # inserted then moved to 10
        (20, 2, 7.5, "twenty"),  # moved 10 -> 20
        # ok 1 deleted in B1, ok 3 deleted in B0, ok 4 -> ck 30 unmatched
    ]
)


def _run(spark, src, mat_path, b_path, ckpt, hook=None):
    stream = spark.readStream.schema(DELTA_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = ivm_join_stream(
        stream, mat_path, b_path, ckpt, "ck", "ok",
        on_batch_committed=hook,
    )
    q.awaitTermination(120)


def test_stream_matches_recompute(spark, tmp_path):
    # two availableNow runs against one checkpoint: the file source
    # orders same-mtime files arbitrarily, so writing both files before
    # one run would apply B1 before B0 on some filesystems — sequential
    # runs pin the batch order the recompute law is stated over
    mat_path, b_path, src = _setup(spark, tmp_path, "gold")
    ckpt = str(tmp_path / "ckpt_gold")
    (src / "b0.json").write_text(B0)
    _run(spark, src, mat_path, b_path, ckpt)
    (src / "b1.json").write_text(B1)
    _run(spark, src, mat_path, b_path, ckpt)
    assert _view(spark, mat_path) == FINAL


def test_crash_in_replay_window_converges_exactly(spark, tmp_path):
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    mat_path, b_path, src = _setup(spark, tmp_path, "crash")
    ckpt = str(tmp_path / "ckpt_crash")
    (src / "b0.json").write_text(B0)
    _run(spark, src, mat_path, b_path, ckpt)

    # b1 arrives; die right after its swap, before the checkpoint
    (src / "b1.json").write_text(B1)

    def crash(batch_id):
        raise RuntimeError("injected crash in the replay window")

    stream = spark.readStream.schema(DELTA_SCHEMA).json(str(src))
    q = ivm_join_stream(
        stream, mat_path, b_path, ckpt, "ck", "ok",
        on_batch_committed=crash,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    # the sink applied b1 before dying
    assert _view(spark, mat_path) == FINAL

    # restart: Spark replays b1 (proven via the hook); idempotent
    # application leaves the view EXACTLY equal — no drift
    replayed = str(tmp_path / "replayed.log")

    def record(batch_id):
        with open(replayed, "a") as f:
            f.write(f"{batch_id}\n")

    _run(spark, src, mat_path, b_path, ckpt, hook=record)
    assert os.path.exists(replayed) and open(replayed).read().strip(), (
        "restart did not replay the uncommitted batch"
    )
    assert _view(spark, mat_path) == FINAL


class TestStreamingExtrema:
    """Streaming extremum maintenance (E152's live twin): signed
    (group, value, ±1) batches advance the persisted support table and
    the derived min/max view. Laws: (1) recompute equivalence after
    replaying all batches; (2) EXACT replay convergence for BOTH crash
    windows — after the support swap but before the extrema swap (the
    stale-view window must HEAL via the unguarded re-derive), and
    after both swaps before the checkpoint commit (the high-water mark
    must skip the double-fold)."""

    SCHEMA = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("sign", T.LongType()),
        ]
    )
    B0 = (
        '{"k": "a", "v": 9.0, "sign": -1}\n'
        '{"k": "b", "v": 8.0, "sign": 1}\n'
    )
    B1 = (
        '{"k": "a", "v": 9.0, "sign": -1}\n'
        '{"k": "c", "v": 2.0, "sign": -1}\n'
        '{"k": "d", "v": 6.0, "sign": 1}\n'
    )
    #: recompute of base ⊕ B0 ⊕ B1: a [5,1], b [3,7,8], d [6], c gone
    FINAL = sorted([("a", 1.0, 5.0, 2), ("b", 3.0, 8.0, 3),
                    ("d", 6.0, 6.0, 1)])

    def _setup(self, spark, tmp_path, tag):
        from mysql_syncer_spark.streaming.ivm import extrema_bootstrap

        base = spark.createDataFrame(
            [("a", 5.0), ("a", 9.0), ("a", 9.0), ("a", 1.0),
             ("b", 3.0), ("b", 7.0), ("c", 2.0)],
            "k STRING, v DOUBLE",
        )
        sup = str(tmp_path / f"sup_{tag}.parquet")
        ext = str(tmp_path / f"ext_{tag}.parquet")
        extrema_bootstrap(base, ["k"], "v", sup, ext)
        src = tmp_path / f"xin_{tag}"
        src.mkdir()
        return sup, ext, src

    def _ext(self, spark, ext_path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(ext_path)
            .select("k", "min_v", "max_v", "n_values")
            .collect()
        )

    def _run(self, spark, src, sup, ext, ckpt, hook_sup=None,
             hook_batch=None):
        from mysql_syncer_spark.streaming.ivm import (
            extrema_maintain_stream,
        )

        stream = spark.readStream.schema(self.SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).json(str(src))
        q = extrema_maintain_stream(
            stream, sup, ext, ckpt, ["k"], "v",
            on_support_committed=hook_sup, on_batch_committed=hook_batch,
        )
        q.awaitTermination(120)

    def test_stream_matches_recompute(self, spark, tmp_path):
        sup, ext, src = self._setup(spark, tmp_path, "gold")
        ckpt = str(tmp_path / "xckpt_gold")
        (src / "b0.json").write_text(self.B0)
        self._run(spark, src, sup, ext, ckpt)
        # after B0: one a-9 deleted -> max still 9 (multiset!)
        mid = {r[0]: r for r in self._ext(spark, ext)}
        assert mid["a"] == ("a", 1.0, 9.0, 3)
        assert mid["b"] == ("b", 3.0, 8.0, 3)
        (src / "b1.json").write_text(self.B1)
        self._run(spark, src, sup, ext, ckpt)
        assert self._ext(spark, ext) == self.FINAL

    def test_crash_between_the_two_swaps_heals(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        sup, ext, src = self._setup(spark, tmp_path, "midcrash")
        ckpt = str(tmp_path / "xckpt_mid")
        (src / "b0.json").write_text(self.B0)
        self._run(spark, src, sup, ext, ckpt)
        (src / "b1.json").write_text(self.B1)

        def crash(batch_id):
            raise RuntimeError("injected crash between the two swaps")

        stream = spark.readStream.schema(self.SCHEMA).json(str(src))
        from mysql_syncer_spark.streaming.ivm import (
            extrema_maintain_stream,
        )

        q = extrema_maintain_stream(
            stream, sup, ext, ckpt, ["k"], "v",
            on_support_committed=crash,
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(120)
        # support advanced, extrema did NOT: the stale-view window
        stale = {r[0]: r for r in self._ext(spark, ext)}
        assert stale["a"][2] == 9.0  # still pre-B1
        # restart: the high-water mark skips the double-fold, the
        # unguarded re-derive heals the view
        self._run(spark, src, sup, ext, ckpt)
        assert self._ext(spark, ext) == self.FINAL

    def test_crash_after_both_swaps_replays_exactly(
        self, spark, tmp_path
    ):
        import os

        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        sup, ext, src = self._setup(spark, tmp_path, "endcrash")
        ckpt = str(tmp_path / "xckpt_end")
        (src / "b0.json").write_text(self.B0)
        self._run(spark, src, sup, ext, ckpt)
        (src / "b1.json").write_text(self.B1)

        def crash(batch_id):
            raise RuntimeError("injected crash in the replay window")

        stream = spark.readStream.schema(self.SCHEMA).json(str(src))
        from mysql_syncer_spark.streaming.ivm import (
            extrema_maintain_stream,
        )

        q = extrema_maintain_stream(
            stream, sup, ext, ckpt, ["k"], "v",
            on_batch_committed=crash,
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(120)
        assert self._ext(spark, ext) == self.FINAL  # applied pre-crash

        replayed = str(tmp_path / "xreplayed.log")

        def record(batch_id):
            with open(replayed, "a") as f:
                f.write(f"{batch_id}\n")

        self._run(spark, src, sup, ext, ckpt, hook_batch=record)
        assert os.path.exists(replayed) and open(replayed).read().strip(), (
            "restart did not replay the uncommitted batch"
        )
        # the double-fold was skipped: n_values would differ otherwise
        assert self._ext(spark, ext) == self.FINAL


class TestStreamingExtremaEmptyingBatch:
    """Regression for the high-water-mark sentinel: a batch that
    legitimately deletes EVERY remaining row must still advance the
    mark (it rides a __support=0 sentinel row, not data rows) — a
    crash after the support swap followed by a replay must NOT
    re-fold the deletes against the emptied table (which would
    underflow and crash-loop the stream)."""

    SCHEMA = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("sign", T.LongType()),
        ]
    )

    def test_emptying_batch_replay_converges(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from mysql_syncer_spark.streaming.ivm import (
            extrema_bootstrap,
            extrema_maintain_stream,
        )

        base = spark.createDataFrame(
            [("a", 5.0), ("b", 3.0)], "k STRING, v DOUBLE"
        )
        sup = str(tmp_path / "esup.parquet")
        ext = str(tmp_path / "eext.parquet")
        extrema_bootstrap(base, ["k"], "v", sup, ext)
        src = tmp_path / "ein"
        src.mkdir()
        # the batch deletes EVERY row in the support table
        (src / "b0.json").write_text(
            '{"k": "a", "v": 5.0, "sign": -1}\n'
            '{"k": "b", "v": 3.0, "sign": -1}\n'
        )

        def crash(batch_id):
            raise RuntimeError("injected crash after the support swap")

        stream = spark.readStream.schema(self.SCHEMA).json(str(src))
        q = extrema_maintain_stream(
            stream, sup, ext, str(tmp_path / "eckpt"), ["k"], "v",
            on_support_committed=crash,
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(120)
        # support emptied but the sentinel still carries the mark
        import pyspark.sql.functions as F

        sup_df = spark.read.parquet(sup)
        assert sup_df.where(F.col("__support") > 0).count() == 0
        assert sup_df.agg(F.max("last_batch")).first()[0] == 0

        # restart: the replay must SKIP the fold (no underflow) and
        # heal the extremum view to empty
        stream2 = spark.readStream.schema(self.SCHEMA).json(str(src))
        q2 = extrema_maintain_stream(
            stream2, sup, ext, str(tmp_path / "eckpt"), ["k"], "v",
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(ext).count() == 0


def test_streaming_frequent_view_rides_the_same_fold(spark, tmp_path):
    """frequent_path maintains the exact top-k-frequent view (E156)
    from the SAME support fold: a streamed delete that demotes a
    group's front-runner surfaces the runner-up in the persisted
    view, batch-over-batch."""
    from mysql_syncer_spark.streaming.ivm import (
        extrema_bootstrap,
        extrema_maintain_stream,
    )

    base = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "p")],
        "k STRING, v STRING",
    )
    sup = str(tmp_path / "fsup.parquet")
    ext = str(tmp_path / "fext.parquet")
    top = str(tmp_path / "ftop.parquet")
    extrema_bootstrap(base, ["k"], "v", sup, ext,
                      frequent_path=top, frequent_k=1)
    assert {(r["k"], r["value"]) for r in
            spark.read.parquet(top).collect()} == {("a", "x"), ("b", "p")}
    src = tmp_path / "fin"
    src.mkdir()
    # delete both x's: y takes over group a's top slot
    (src / "b0.json").write_text(
        '{"k": "a", "v": "x", "sign": -1}\n'
        '{"k": "a", "v": "x", "sign": -1}\n'
    )
    schema = T.StructType(
        [T.StructField("k", T.StringType()),
         T.StructField("v", T.StringType()),
         T.StructField("sign", T.LongType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = extrema_maintain_stream(
        stream, sup, ext, str(tmp_path / "fckpt"), ["k"], "v",
        frequent_path=top, frequent_k=1,
    )
    q.awaitTermination(120)
    got = {(r["k"], r["value"], r["n"]) for r in
           spark.read.parquet(top).collect()}
    assert got == {("a", "y", 1), ("b", "p", 1)}


def test_fresh_checkpoint_against_advanced_support_fails_loudly(
    spark, tmp_path
):
    """Round-9 ADVICE: a fresh checkpoint dir against an advanced
    support table resets batch ids to 0 <= hwm, which used to skip
    every fold silently (frozen state, no error). Now the maintainer
    raises when batch_id is strictly below the high-water mark."""
    import pyspark.sql.types as T
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    from mysql_syncer_spark.streaming.ivm import (
        extrema_bootstrap,
        extrema_maintain_stream,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("sign", T.LongType()),
        ]
    )
    base = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0)], "k STRING, v DOUBLE"
    )
    sup = str(tmp_path / "sup_fresh.parquet")
    ext = str(tmp_path / "ext_fresh.parquet")
    extrema_bootstrap(base, ["k"], "v", sup, ext)
    src = tmp_path / "xin_fresh"
    src.mkdir()
    (src / "b0.json").write_text('{"k": "a", "v": 7.0, "sign": 1}\n')
    (src / "b1.json").write_text('{"k": "b", "v": 1.0, "sign": 1}\n')

    def run(ckpt):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).json(str(src))
        return extrema_maintain_stream(
            stream, sup, ext, ckpt, ["k"], "v"
        )

    q = run(str(tmp_path / "ck_orig"))
    q.awaitTermination(120)  # hwm advances to 1
    # same support path, NEW checkpoint: batch ids restart at 0
    q2 = run(str(tmp_path / "ck_fresh"))
    with pytest.raises(StreamingQueryException, match="high-water"):
        q2.awaitTermination(120)
