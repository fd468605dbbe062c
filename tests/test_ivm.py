"""Incremental join maintenance (operators/ivm.py): the law under
test is REFRESH EQUIVALENCE — after any keyed delta batch,
``apply_join_delta(M, ...)`` must equal the full recompute
``(A ⊕ ΔA) ⋈ (B ⊕ ΔB)`` row-for-row, across every delta class
(insert/update/delete, either side, both sides at once), and chained
batch-over-batch. Plus the plan law: the big sides must never
shuffle — every repair term broadcasts delta-derived frames."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.ivm import (
    apply_join_delta,
    apply_table_delta,
    join_snapshot,
)

A_SCHEMA = "ok long, ck long, price double"
B_SCHEMA = "ck long, name string"
DA_SCHEMA = "ok long, ck long, price double, op string"
DB_SCHEMA = "ck long, name string, op string"

A0 = [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 9.0), (4, 30, 1.0)]
B0 = [(10, "ten"), (20, "twenty"), (40, "forty")]


def _sets(df):
    return sorted(tuple(r) for r in df.collect())


def _recompute(a, b):
    return _sets(join_snapshot(a, b, "ck"))


@pytest.fixture(scope="module")
def base(spark):
    a = spark.createDataFrame(A0, A_SCHEMA)
    b = spark.createDataFrame(B0, B_SCHEMA)
    return a, b, join_snapshot(a, b, "ck")


def _step(spark, a, b, mat, da, db):
    da_df = spark.createDataFrame(da, DA_SCHEMA)
    db_df = spark.createDataFrame(db, DB_SCHEMA)
    mat2 = apply_join_delta(
        mat, a, da_df, b, db_df, "ck", "ok", "ck"
    )
    a2 = apply_table_delta(a, da_df, ["ok"])
    b2 = apply_table_delta(b, db_df, ["ck"])
    return a2, b2, mat2


def test_all_delta_classes_match_recompute(spark, base):
    a, b, mat = base
    da = [
        (2, 20, 7.5, "upsert"),   # update incl. FK move 10 -> 20
        (5, 40, 2.0, "upsert"),   # insert, matches b 40
        (3, None, None, "delete"),
    ]
    db = [
        (10, "TEN", "upsert"),    # update touches kept a-rows 1
        (30, "thirty", "upsert"), # insert makes a-row 4 match
        (40, None, "delete"),     # delete kills the new a-row 5 pair
    ]
    a2, b2, mat2 = _step(spark, a, b, mat, da, db)
    got = _sets(mat2)
    assert got == _recompute(a2, b2)
    # spot semantics: row 5 joined b'40'? b 40 deleted -> absent
    assert not any(r[1] == 5 for r in got)
    # row 4 now matches the inserted b 30
    assert any(r[0] == 30 and r[1] == 4 for r in got)


def test_same_join_key_in_both_deltas_not_double_counted(spark, base):
    a, b, mat = base
    da = [(1, 10, 5.5, "upsert")]
    db = [(10, "TEN", "upsert")]
    a2, b2, mat2 = _step(spark, a, b, mat, da, db)
    rows = _sets(mat2)
    assert rows == _recompute(a2, b2)
    assert len([r for r in rows if r[0] == 10 and r[1] == 1]) == 1


def test_chained_batches(spark, base):
    a, b, mat = base
    batches = [
        ([(6, 20, 3.0, "upsert")], []),
        ([], [(20, "XX", "upsert")]),
        ([(6, None, None, "delete"), (1, 40, 5.0, "upsert")],
         [(10, None, "delete")]),
    ]
    for da, db in batches:
        da = da or [(999999, None, None, "delete")]  # no-op key
        db = db or [(999999, None, "delete")]
        a, b, mat = _step(spark, a, b, mat, da, db)
        # cut per batch, as production does (ivm.py chaining contract)
        mat = mat.localCheckpoint()
        assert _sets(mat) == _recompute(a, b)


def test_empty_delta_is_identity(spark, base):
    a, b, mat = base
    da = spark.createDataFrame([], DA_SCHEMA)
    db = spark.createDataFrame([], DB_SCHEMA)
    mat2 = apply_join_delta(mat, a, da, b, db, "ck", "ok", "ck")
    assert _sets(mat2) == _sets(mat)


def test_deltas_are_broadcast(spark, base):
    a, b, mat = base
    # in production M is a materialized table read back from storage;
    # checkpoint stands in so the snapshot join's own plan (which
    # legitimately shuffles at bootstrap) doesn't pollute the gate
    mat = mat.localCheckpoint()
    da = spark.createDataFrame([(1, 10, 5.5, "upsert")], DA_SCHEMA)
    db = spark.createDataFrame([(10, "TEN", "upsert")], DB_SCHEMA)
    mat2 = apply_join_delta(mat, a, da, b, db, "ck", "ok", "ck")
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        mat2._jdf.queryExecution(), "formatted"
    )
    # every join in the maintenance plan is broadcast-shaped: the big
    # sides (mat, A, B) never hit an exchange-for-join
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_validation(spark, base):
    a, b, mat = base
    bad = spark.createDataFrame([(1, 10, 5.5)], A_SCHEMA)
    with pytest.raises(ValueError, match="op column"):
        apply_join_delta(mat, a, bad, b, bad, "ck", "ok", "ck")
    da = spark.createDataFrame([], DA_SCHEMA)
    with pytest.raises(ValueError, match="pk column"):
        apply_join_delta(
            mat.drop("ok"), a, da, b, da, "ck", "ok", "ck"
        )


def test_a_only_apply_matches_recompute_and_is_idempotent(spark, base):
    from mysql_syncer_spark.operators.ivm import apply_join_delta_a_only

    a, b, mat = base
    da = spark.createDataFrame(
        [(2, 20, 7.5, "upsert"), (5, 40, 2.0, "upsert"),
         (3, None, None, "delete")],
        DA_SCHEMA,
    )
    m1 = apply_join_delta_a_only(mat, da, b, "ck", "ok")
    a2 = apply_table_delta(a, da, ["ok"])
    assert _sets(m1.select(*mat.columns)) == _recompute(a2, b)
    # idempotence: the law the streaming maintainer's exact replay
    # convergence rests on
    m2 = apply_join_delta_a_only(m1, da, b, "ck", "ok")
    assert _sets(m2.select(*mat.columns)) == _sets(m1.select(*mat.columns))


class TestLeftJoinIVM:
    """Left-outer maintenance with null-compensation: facts keep a
    NULL-padded row while no dimension row matches; the pad retracts
    when the dimension row arrives (late-arriving dimension) and
    re-appears when it is deleted. Law: fold ≡ full LEFT recompute."""

    def _left_recompute(self, a, b, cols=None):
        from mysql_syncer_spark.operators.ivm import left_join_snapshot

        out = left_join_snapshot(a, b, "ck")
        return _sets(out.select(*cols) if cols else out)

    def _lstep(self, spark, a, b, mat, da, db):
        from mysql_syncer_spark.operators.ivm import apply_left_join_delta

        da_df = spark.createDataFrame(da, DA_SCHEMA)
        db_df = spark.createDataFrame(db, DB_SCHEMA)
        mat2 = apply_left_join_delta(
            mat, da_df, b, db_df, "ck", "ok", "ck"
        )
        a2 = apply_table_delta(a, da_df, ["ok"])
        b2 = apply_table_delta(b, db_df, ["ck"])
        return a2, b2, mat2

    @pytest.fixture(scope="class")
    def lbase(self, spark):
        from mysql_syncer_spark.operators.ivm import left_join_snapshot

        a = spark.createDataFrame(A0, A_SCHEMA)
        b = spark.createDataFrame(B0, B_SCHEMA)
        return a, b, left_join_snapshot(a, b, "ck")

    def test_snapshot_pads_unmatched_facts(self, lbase):
        a, b, mat = lbase
        rows = _sets(mat.select("ok", "ck", "price", "name"))
        # fact 4 (ck=30) has no dimension row -> NULL-padded
        assert (4, 30, 1.0, None) in rows
        assert len(rows) == 4

    def test_dim_insert_after_fact_retracts_pad(self, spark, lbase):
        a, b, mat = lbase
        a2, b2, mat2 = self._lstep(
            spark, a, b, mat, [], [(30, "thirty", "upsert")]
        )
        rows = _sets(mat2.select(*mat.columns))
        assert rows == self._left_recompute(a2, b2)
        got = {r[:2]: r for r in _sets(
            mat2.select("ok", "ck", "price", "name"))}
        assert got[(4, 30)][3] == "thirty"  # pad retracted
        assert len(got) == 4                # no duplicate pad row

    def test_dim_delete_restores_pad(self, spark, lbase):
        a, b, mat = lbase
        a2, b2, mat2 = self._lstep(
            spark, a, b, mat, [], [(20, None, "delete")]
        )
        rows = _sets(mat2.select(*mat.columns))
        assert rows == self._left_recompute(a2, b2)
        got = {r[:2]: r for r in _sets(
            mat2.select("ok", "ck", "price", "name"))}
        assert got[(3, 20)][3] is None      # fact kept, NULL-padded

    def test_both_sides_deltas_match_recompute(self, spark, lbase):
        a, b, mat = lbase
        da = [
            (2, 20, 7.5, "upsert"),    # FK move 10 -> 20
            (5, 99, 2.0, "upsert"),    # insert with NO dim -> pad
            (3, None, None, "delete"),
        ]
        db = [
            (10, "TEN", "upsert"),
            (30, "thirty", "upsert"),  # late dim for fact 4
            (40, None, "delete"),
        ]
        a2, b2, mat2 = self._lstep(spark, a, b, mat, da, db)
        rows = _sets(mat2.select(*mat.columns))
        assert rows == self._left_recompute(a2, b2)
        got = {r[:2]: r for r in _sets(
            mat2.select("ok", "ck", "price", "name"))}
        assert got[(5, 99)][3] is None      # new fact padded
        assert got[(4, 30)][3] == "thirty"  # late dim matched

    def test_chained_batches(self, spark, lbase):
        a, b, mat = lbase
        batches = [
            ([(6, 50, 3.0, "upsert")], [(50, "fifty", "upsert")]),
            ([], [(50, None, "delete")]),           # pad comes back
            ([(6, None, None, "delete")], [(10, "X", "upsert")]),
        ]
        cols = ["ok", "ck", "price", "name"]
        for da, db in batches:
            a, b, mat = self._lstep(spark, a, b, mat, da, db)
            # production reads the materialized view back from storage
            # each batch (ivm.py chaining contract); without the cut
            # the maintainer's view references compound exponentially
            # across batches — same discipline as the full-join twin
            mat = mat.localCheckpoint()
            assert _sets(mat.select(*cols)) == \
                self._left_recompute(a, b, cols)

    def test_null_join_key_fact_rides_through(self, spark, lbase):
        from mysql_syncer_spark.operators.ivm import (
            apply_left_join_delta, left_join_snapshot,
        )

        a = spark.createDataFrame(A0 + [(9, None, 4.0)], A_SCHEMA)
        b, mat = lbase[1], left_join_snapshot(
            spark.createDataFrame(A0 + [(9, None, 4.0)], A_SCHEMA),
            lbase[1], "ck")
        da = spark.createDataFrame([], DA_SCHEMA)
        db = spark.createDataFrame([(10, "TEN", "upsert")], DB_SCHEMA)
        mat2 = apply_left_join_delta(mat, da, b, db, "ck", "ok", "ck")
        b2 = apply_table_delta(b, db, ["ck"])

        def nsets(df):  # None-tolerant sort (NULL join key rows)
            return sorted(
                (tuple(r) for r in df.collect()), key=repr
            )

        assert nsets(mat2.select(*mat.columns)) == nsets(
            left_join_snapshot(a, b2, "ck").select(*mat.columns))
        got = {r[:2]: r for r in _sets(
            mat2.select("ok", "ck", "price", "name"))}
        assert got[(9, None)][3] is None

    def test_plan_is_broadcast_only(self, spark, lbase):
        from mysql_syncer_spark.operators.ivm import apply_left_join_delta

        a, b, mat = lbase
        mat = mat.localCheckpoint()
        da = spark.createDataFrame([(1, 10, 5.5, "upsert")], DA_SCHEMA)
        db = spark.createDataFrame([(30, "thirty", "upsert")], DB_SCHEMA)
        mat2 = apply_left_join_delta(mat, da, b, db, "ck", "ok", "ck")
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            mat2._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark, lbase):
        from mysql_syncer_spark.operators.ivm import apply_left_join_delta

        a, b, mat = lbase
        da = spark.createDataFrame([], DA_SCHEMA)
        db_no_jk = spark.createDataFrame(
            [("x", "delete")], "name string, op string"
        )
        with pytest.raises(ValueError, match="join column"):
            apply_left_join_delta(mat, da, b, db_no_jk, "ck", "ok", "ck")
        with pytest.raises(ValueError, match="dimension column"):
            apply_left_join_delta(
                mat.drop("name"), da, b,
                spark.createDataFrame([], DB_SCHEMA), "ck", "ok", "ck")


class TestFullJoinIVM:
    """FULL-outer maintenance with two-sided null-compensation: an
    A-delete can CREATE a right-only pad (its partner loses its last
    match), an A-upsert can RETRACT one, and symmetrically for B —
    plus the jk-change edge (an upsert moving a row's join key must
    re-pad the partner left behind at the OLD key, recovered from the
    view). Law: fold ≡ full FULL-outer recompute."""

    def _full_recompute(self, a, b, cols):
        from mysql_syncer_spark.operators.ivm import full_join_snapshot

        return self._nsets(full_join_snapshot(a, b, "ck").select(*cols))

    @staticmethod
    def _nsets(df):  # None-tolerant sort (pads carry NULL keys)
        return sorted((tuple(r) for r in df.collect()), key=repr)

    def _fstep(self, spark, a, b, mat, da, db):
        from mysql_syncer_spark.operators.ivm import apply_full_join_delta

        da_df = spark.createDataFrame(da, DA_SCHEMA)
        db_df = spark.createDataFrame(db, DB_SCHEMA)
        mat2 = apply_full_join_delta(mat, da_df, db_df, "ck", "ok", "ck")
        a2 = apply_table_delta(a, da_df, ["ok"])
        b2 = apply_table_delta(b, db_df, ["ck"])
        return a2, b2, mat2

    @pytest.fixture(scope="class")
    def fbase(self, spark):
        from mysql_syncer_spark.operators.ivm import full_join_snapshot

        a = spark.createDataFrame(A0, A_SCHEMA)
        b = spark.createDataFrame(B0, B_SCHEMA)
        return a, b, full_join_snapshot(a, b, "ck")

    def test_snapshot_pads_both_sides(self, fbase):
        a, b, mat = fbase
        rows = self._nsets(mat.select("ok", "ck", "price", "name"))
        assert (4, 30, 1.0, None) in rows          # left-only pad
        assert (None, 40, None, "forty") in rows   # right-only pad
        assert len(rows) == 5

    def test_a_delete_creates_right_pad(self, spark, fbase):
        a, b, mat = fbase
        # fact 3 is the ONLY fact on ck=20 -> b 'twenty' re-pads
        a2, b2, mat2 = self._fstep(
            spark, a, b, mat, [(3, None, None, "delete")], []
        )
        cols = ["ok", "ck", "price", "name"]
        rows = self._nsets(mat2.select(*cols))
        assert rows == self._full_recompute(a2, b2, cols)
        assert (None, 20, None, "twenty") in rows

    def test_a_upsert_retracts_right_pad(self, spark, fbase):
        a, b, mat = fbase
        a2, b2, mat2 = self._fstep(
            spark, a, b, mat, [(5, 40, 2.0, "upsert")], []
        )
        cols = ["ok", "ck", "price", "name"]
        rows = self._nsets(mat2.select(*cols))
        assert rows == self._full_recompute(a2, b2, cols)
        assert (5, 40, 2.0, "forty") in rows
        assert (None, 40, None, "forty") not in rows

    def test_jk_change_repads_old_partner(self, spark, fbase):
        a, b, mat = fbase
        # fact 3 moves 20 -> 10: b 'twenty' loses its last match and
        # must re-enter as a right-only pad at the OLD key
        a2, b2, mat2 = self._fstep(
            spark, a, b, mat, [(3, 10, 9.0, "upsert")], []
        )
        cols = ["ok", "ck", "price", "name"]
        rows = self._nsets(mat2.select(*cols))
        assert rows == self._full_recompute(a2, b2, cols)
        assert (None, 20, None, "twenty") in rows
        assert (3, 10, 9.0, "ten") in rows

    def test_both_sides_deltas_match_recompute(self, spark, fbase):
        a, b, mat = fbase
        da = [
            (2, 20, 7.5, "upsert"),     # FK move 10 -> 20
            (5, 99, 2.0, "upsert"),     # insert with NO dim -> left pad
            (3, None, None, "delete"),
        ]
        db = [
            (10, "TEN", "upsert"),
            (30, "thirty", "upsert"),   # late dim retracts fact 4's pad
            (40, None, "delete"),       # right-only pad disappears
        ]
        a2, b2, mat2 = self._fstep(spark, a, b, mat, da, db)
        cols = ["ok", "ck", "price", "name"]
        rows = self._nsets(mat2.select(*cols))
        assert rows == self._full_recompute(a2, b2, cols)
        assert (5, 99, 2.0, None) in rows
        assert (4, 30, 1.0, "thirty") in rows
        assert not any(r[1] == 40 for r in rows)

    def test_null_join_key_upserts_become_pads(self, spark, fbase):
        a, b, mat = fbase
        a2, b2, mat2 = self._fstep(
            spark, a, b, mat, [(9, None, 4.0, "upsert")], []
        )
        cols = ["ok", "ck", "price", "name"]
        rows = self._nsets(mat2.select(*cols))
        assert rows == self._full_recompute(a2, b2, cols)
        assert (9, None, 4.0, None) in rows

    def test_chained_batches(self, spark, fbase):
        a, b, mat = fbase
        cols = ["ok", "ck", "price", "name"]
        batches = [
            ([(6, 50, 3.0, "upsert")], [(50, "fifty", "upsert")]),
            ([], [(50, None, "delete")]),         # fact 6 re-pads
            ([(6, None, None, "delete")], [(10, "X", "upsert")]),
            ([(1, 40, 5.0, "upsert")], []),       # move onto b 40
        ]
        for da, db in batches:
            a, b, mat = self._fstep(spark, a, b, mat, da, db)
            # production reads the materialized view back from storage
            # each batch; without the cut the maintainer's 5 view
            # references compound exponentially across batches
            mat = mat.localCheckpoint()
            assert self._nsets(mat.select(*cols)) == \
                self._full_recompute(a, b, cols)

    def test_empty_delta_is_identity(self, spark, fbase):
        from mysql_syncer_spark.operators.ivm import apply_full_join_delta

        a, b, mat = fbase
        da = spark.createDataFrame([], DA_SCHEMA)
        db = spark.createDataFrame([], DB_SCHEMA)
        mat2 = apply_full_join_delta(mat, da, db, "ck", "ok", "ck")
        assert self._nsets(mat2.select(*mat.columns)) == \
            self._nsets(mat)

    def test_plan_shape(self, spark, fbase):
        from mysql_syncer_spark.operators.ivm import apply_full_join_delta

        a, b, mat = fbase
        mat = mat.localCheckpoint()
        da = spark.createDataFrame([(1, 10, 5.5, "upsert")], DA_SCHEMA)
        db = spark.createDataFrame([(30, "thirty", "upsert")], DB_SCHEMA)
        mat2 = apply_full_join_delta(mat, da, db, "ck", "ok", "ck")
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            mat2._jdf.queryExecution(), "formatted"
        )
        # every join touching the view is broadcast; the ONE shuffling
        # join Spark permits no broadcast for is the full-outer region
        # rebuild — and both its inputs are delta-keyed slices
        import re

        smj_kinds = set(re.findall(r"SortMergeJoin (\w+)", plan))
        assert smj_kinds <= {"FullOuter"}, plan
        tree_smj = [
            ln for ln in plan.splitlines()
            if "SortMergeJoin" in ln and "+-" in ln
        ]
        assert len(tree_smj) <= 1, plan
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark, fbase):
        from mysql_syncer_spark.operators.ivm import apply_full_join_delta

        a, b, mat = fbase
        bad = spark.createDataFrame([(1, 10, 5.5)], A_SCHEMA)
        db = spark.createDataFrame([], DB_SCHEMA)
        with pytest.raises(ValueError, match="op column"):
            apply_full_join_delta(mat, bad, db, "ck", "ok", "ck")
        da = spark.createDataFrame([], DA_SCHEMA)
        with pytest.raises(ValueError, match="must carry column"):
            apply_full_join_delta(
                mat.drop("name"), da, db, "ck", "ok", "ck"
            )
        overlap = spark.createDataFrame(
            [], "ck long, price double, op string"
        )
        with pytest.raises(ValueError, match="overlap"):
            apply_full_join_delta(mat, da, overlap, "ck", "ok", "ck")


class TestLeftJoinKeyChange:
    """The ``b_pk != on`` edge (round-9 ADVICE, medium): a dimension
    upsert that MOVES a row to a new join key names only the NEW key
    in the delta, but facts still joined at the OLD key carry
    superseded attributes — they must re-derive (back to a NULL pad,
    or onto whatever dimension row now owns that key). The fix
    recovers old keys from the view's own ``b_pk`` columns, mirroring
    apply_full_join_delta. Law stays: fold ≡ full LEFT recompute."""

    BK_SCHEMA = "bid long, ck long, name string"
    DBK_SCHEMA = "bid long, ck long, name string, op string"

    @pytest.fixture(scope="class")
    def kbase(self, spark):
        from mysql_syncer_spark.operators.ivm import left_join_snapshot

        a = spark.createDataFrame(
            [(1, 10, 5.0), (2, 20, 7.0), (3, 30, 1.0), (4, 10, 2.0)],
            A_SCHEMA,
        )
        b = spark.createDataFrame(
            [(100, 10, "ten"), (200, 20, "twenty")], self.BK_SCHEMA
        )
        return a, b, left_join_snapshot(a, b, "ck")

    def _fold(self, spark, a, b, mat, db):
        from mysql_syncer_spark.operators.ivm import (
            apply_left_join_delta,
            left_join_snapshot,
        )

        da = spark.createDataFrame([], DA_SCHEMA)
        db_df = spark.createDataFrame(db, self.DBK_SCHEMA)
        mat2 = apply_left_join_delta(mat, da, b, db_df, "ck", "ok", "bid")
        b2 = apply_table_delta(b, db_df, ["bid"])
        return b2, mat2, left_join_snapshot(a, b2, "ck")

    def test_upsert_moves_join_key(self, spark, kbase):
        a, b, mat = kbase
        b2, mat2, want = self._fold(
            spark, a, b, mat, [(100, 30, "ten-moved", "upsert")]
        )
        assert _sets(mat2.select(*mat.columns)) == _sets(
            want.select(*mat.columns)
        )
        got = {r["ok"]: r["name"] for r in mat2.select("ok", "name").collect()}
        # BOTH facts at the vacated key re-pad; the new-key fact matches
        assert got[1] is None and got[4] is None
        assert got[3] == "ten-moved"
        assert got[2] == "twenty"  # untouched key rides through kept

    def test_move_onto_occupied_key(self, spark, kbase):
        # dim 200 moves 20 -> 10: facts at 10 switch from "ten" to
        # BOTH dim rows? No — dim 100 still owns 10 too, so facts at
        # 10 fan out to two rows; fact at 20 re-pads. Recompute law
        # covers the fan-out exactly.
        a, b, mat = kbase
        b2, mat2, want = self._fold(
            spark, a, b, mat, [(200, 10, "twenty-moved", "upsert")]
        )
        assert _sets(mat2.select(*mat.columns)) == _sets(
            want.select(*mat.columns)
        )
        got = {r["ok"]: r["name"] for r in
               mat2.select("ok", "name").where(F.col("ok") == 2).collect()}
        assert got[2] is None  # vacated key re-padded

    def test_delete_by_pk_repads(self, spark, kbase):
        a, b, mat = kbase
        b2, mat2, want = self._fold(
            spark, a, b, mat, [(200, 20, None, "delete")]
        )
        assert _sets(mat2.select(*mat.columns)) == _sets(
            want.select(*mat.columns)
        )

    def test_chained_moves_match_recompute(self, spark, kbase):
        a, b, mat = kbase
        batches = [
            [(100, 30, "m1", "upsert")],            # 10 -> 30
            [(100, 20, "m2", "upsert"),             # 30 -> 20 (shared)
             (200, 99, "m3", "upsert")],            # 20 -> 99 (orphan)
            [(100, None, None, "delete")],          # everything pads
        ]
        from mysql_syncer_spark.operators.ivm import left_join_snapshot

        for db in batches:
            b, mat, want = self._fold(spark, a, b, mat, db)
            mat = mat.localCheckpoint()
            assert _sets(mat.select(*want.columns)) == _sets(want)
