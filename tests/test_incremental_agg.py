"""Incremental rollup maintenance (operators/incremental_agg.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.incremental_agg import (
    agg_snapshot,
    apply_agg_delta,
)

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long"
    )
    delta = spark.createDataFrame(
        [("a", 1), ("c", 99)], "k string, v long"  # existing + NEW group
    )
    return base, delta


def test_fold_equals_recompute(frames):
    base, delta = frames
    folded = apply_agg_delta(
        agg_snapshot(base, ["k"], MEASURES), delta, ["k"], MEASURES
    )
    recomputed = agg_snapshot(base.unionByName(delta), ["k"], MEASURES)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_untouched_groups_pass_through(frames):
    base, delta = frames
    rollup = agg_snapshot(base, ["k"], MEASURES)
    folded = apply_agg_delta(rollup, delta, ["k"], MEASURES)
    b_row = {r["k"]: r for r in rollup.collect()}["b"]
    f_row = {r["k"]: r for r in folded.collect()}["b"]
    assert tuple(b_row) == tuple(f_row)  # bit-identical, no arithmetic


def test_compensating_delta_for_sum_count(spark, frames):
    base, _ = frames
    measures = {"n": ("count", "*"), "total": ("sum", "v")}
    rollup = agg_snapshot(base, ["k"], measures)
    # retract one ("a", 20) row: count delta -1, sum delta -20
    comp = spark.createDataFrame([("a", -20, -1)], "k string, v long, c long")
    # counts need an explicit sum-of-c measure for retractions
    folded = apply_agg_delta(
        rollup.withColumnRenamed("n", "n_"), comp, ["k"],
        {"n_": ("sum", "c"), "total": ("sum", "v")},
        allow_negative=True,
    )
    got = {r["k"]: r for r in folded.collect()}
    assert got["a"]["n_"] == 1 and got["a"]["total"] == 10


def test_minmax_retraction_rejected(frames):
    base, delta = frames
    rollup = agg_snapshot(base, ["k"], MEASURES)
    with pytest.raises(ValueError):
        apply_agg_delta(rollup, delta, ["k"], MEASURES, allow_negative=True)
    with pytest.raises(ValueError):
        agg_snapshot(base, ["k"], {"x": ("avg", "v")})


def test_fold_is_associative_over_batches(spark, frames):
    base, _ = frames
    d1 = spark.createDataFrame([("a", 7)], "k string, v long")
    d2 = spark.createDataFrame([("b", 3), ("d", 1)], "k string, v long")
    one_by_one = apply_agg_delta(
        apply_agg_delta(agg_snapshot(base, ["k"], MEASURES), d1, ["k"], MEASURES),
        d2, ["k"], MEASURES,
    )
    all_at_once = apply_agg_delta(
        agg_snapshot(base, ["k"], MEASURES),
        d1.unionByName(d2), ["k"], MEASURES,
    )
    assert sorted(map(tuple, one_by_one.collect())) == sorted(
        map(tuple, all_at_once.collect())
    )


def test_signed_count_retraction(spark):
    """The retractable count: modeled as sum over a ±1 sign column, a
    compensating delete batch genuinely decrements — and the folded
    rollup equals a recompute over the surviving rows."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.incremental_agg import (
        agg_snapshot,
        apply_agg_delta,
    )

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "k STRING, v DOUBLE"
    )
    measures = {"n": ("signed_count", "__sign"), "total": ("sum", "v")}
    rollup = agg_snapshot(
        base.withColumn("__sign", F.lit(1)), ["k"], measures
    )
    assert {(r["k"], r["n"]) for r in rollup.collect()} == {
        ("a", 2), ("b", 1),
    }
    # compensating batch: delete one 'a' row (sign -1, negated value),
    # insert one 'c' row
    delta = spark.createDataFrame(
        [("a", -20.0, -1), ("c", 7.0, 1)], "k STRING, v DOUBLE, __sign INT"
    )
    folded = apply_agg_delta(
        rollup, delta, ["k"], measures, allow_negative=True
    )
    survivors = spark.createDataFrame(
        [("a", 10.0), ("b", 5.0), ("c", 7.0)], "k STRING, v DOUBLE"
    ).withColumn("__sign", F.lit(1))
    recomputed = agg_snapshot(survivors, ["k"], measures)
    got = {(r["k"], r["n"], r["total"]) for r in folded.collect()}
    want = {(r["k"], r["n"], r["total"]) for r in recomputed.collect()}
    assert got == want == {("a", 1, 10.0), ("b", 1, 5.0), ("c", 1, 7.0)}


def test_plain_count_is_not_retractable_documented(spark):
    """Regression pin for the documented limitation: a 'count' measure
    treats every delta row as +1 even under allow_negative — the
    retraction path is signed_count."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.incremental_agg import (
        agg_snapshot,
        apply_agg_delta,
    )

    base = spark.createDataFrame([("a", 1.0)], "k STRING, v DOUBLE")
    measures = {"n": ("count", "*")}
    rollup = agg_snapshot(base, ["k"], measures)
    delta = spark.createDataFrame([("a", -1.0)], "k STRING, v DOUBLE")
    folded = apply_agg_delta(rollup, delta, ["k"], measures,
                             allow_negative=True)
    assert folded.first()["n"] == 2  # counted the delete row: documented


class TestExtremumIVM:
    """The two-level delete-maintainable extremum: a per-(group, value)
    support table (itself a signed_count rollup, hence retractable)
    from which min/max is re-derived for TOUCHED groups only. Laws:
    fold ≡ full recompute after any signed batch (including deleting a
    group's current max — the case plain min/max monoids cannot
    retract), untouched groups pass through bit-identical, an emptied
    group disappears, and over-deletion raises."""

    @staticmethod
    def _ops():
        from mysql_syncer_spark.operators import incremental_agg as ia

        return ia

    @pytest.fixture(scope="class")
    def ebase(self, spark):
        ia = self._ops()
        rows = [
            ("a", 5.0), ("a", 9.0), ("a", 9.0), ("a", 1.0),
            ("b", 3.0), ("b", 7.0),
            ("c", 2.0),
        ]
        base = spark.createDataFrame(rows, "k STRING, v DOUBLE")
        sup = ia.value_support_snapshot(base, ["k"], "v")
        ext = ia.extremum_snapshot(sup, ["k"], "v")
        return base, sup, ext

    @staticmethod
    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    def test_snapshot(self, ebase):
        _, _, ext = ebase
        assert self._rows(ext) == [
            ("a", 1.0, 9.0, 4), ("b", 3.0, 7.0, 2), ("c", 2.0, 2.0, 1)
        ]

    def test_delete_of_max_falls_to_runner_up(self, spark, ebase):
        ia = self._ops()
        base, sup, ext = ebase
        # delete ONE of the two 9.0s: max stays 9.0 (multiset!), then
        # delete the second: max falls to 5.0
        d1 = spark.createDataFrame(
            [("a", 9.0, -1)], "k STRING, v DOUBLE, sign LONG"
        )
        sup1 = ia.apply_value_support_delta(sup, d1, ["k"], "v")
        ext1 = ia.apply_extremum_delta(ext, sup1, d1, ["k"], "v")
        assert ("a", 1.0, 9.0, 3) in self._rows(ext1)
        sup2 = ia.apply_value_support_delta(sup1, d1, ["k"], "v")
        ext2 = ia.apply_extremum_delta(ext1, sup2, d1, ["k"], "v")
        assert ("a", 1.0, 5.0, 2) in self._rows(ext2)

    def test_untouched_groups_pass_through(self, spark, ebase):
        ia = self._ops()
        _, sup, ext = ebase
        d = spark.createDataFrame(
            [("a", 1.0, -1)], "k STRING, v DOUBLE, sign LONG"
        )
        sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
        ext1 = ia.apply_extremum_delta(ext, sup1, d, ["k"], "v")
        got = self._rows(ext1)
        assert ("b", 3.0, 7.0, 2) in got and ("c", 2.0, 2.0, 1) in got
        assert ("a", 5.0, 9.0, 3) in got  # min retracted to 5.0

    def test_emptied_group_disappears_new_group_appears(
        self, spark, ebase
    ):
        ia = self._ops()
        _, sup, ext = ebase
        d = spark.createDataFrame(
            [("c", 2.0, -1), ("d", 4.0, 1)],
            "k STRING, v DOUBLE, sign LONG",
        )
        sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
        ext1 = ia.apply_extremum_delta(ext, sup1, d, ["k"], "v")
        got = self._rows(ext1)
        assert not any(r[0] == "c" for r in got)
        assert ("d", 4.0, 4.0, 1) in got

    def test_fold_equals_recompute_chained(self, spark, ebase):
        ia = self._ops()
        base, sup, ext = ebase
        batches = [
            [("a", 9.0, -1), ("b", 8.0, 1)],
            [("a", 9.0, -1), ("a", 1.0, -1), ("c", 2.0, -1)],
            [("a", 0.5, 1), ("d", 6.0, 1)],
        ]
        cur = [tuple(r) for r in base.collect()]
        for batch in batches:
            d = spark.createDataFrame(
                batch, "k STRING, v DOUBLE, sign LONG"
            )
            sup = ia.apply_value_support_delta(sup, d, ["k"], "v")
            ext = ia.apply_extremum_delta(ext, sup, d, ["k"], "v")
            for k, v, s in batch:  # maintain the python-side multiset
                if s > 0:
                    cur.append((k, v))
                else:
                    cur.remove((k, v))
            rec = ia.extremum_snapshot(
                ia.value_support_snapshot(
                    spark.createDataFrame(cur, "k STRING, v DOUBLE"),
                    ["k"], "v"),
                ["k"], "v")
            assert self._rows(ext) == self._rows(rec)

    def test_null_values_excluded(self, spark):
        ia = self._ops()
        base = spark.createDataFrame(
            [("a", 1.0), ("a", None)], "k STRING, v DOUBLE"
        )
        sup = ia.value_support_snapshot(base, ["k"], "v")
        ext = ia.extremum_snapshot(sup, ["k"], "v")
        assert self._rows(ext) == [("a", 1.0, 1.0, 1)]

    def test_over_deletion_raises(self, spark, ebase):
        ia = self._ops()
        _, sup, _ = ebase
        d = spark.createDataFrame(
            [("c", 2.0, -2)], "k STRING, v DOUBLE, sign LONG"
        )
        bad = ia.apply_value_support_delta(sup, d, ["k"], "v")
        with pytest.raises(Exception, match="support underflow"):
            bad.collect()

    def test_maintenance_joins_are_broadcast(self, spark, ebase):
        ia = self._ops()
        _, sup, ext = ebase
        sup = sup.localCheckpoint()
        ext = ext.localCheckpoint()
        d = spark.createDataFrame(
            [("a", 9.0, -1)], "k STRING, v DOUBLE, sign LONG"
        )
        sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
        out = ia.apply_extremum_delta(ext, sup1, d, ["k"], "v")
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # kept/re-derive prune via broadcast on the delta's group keys;
        # the one shuffling join is the support merge — full-outer on
        # (group, value) between the values-sized state and the
        # delta-sized aggregate
        import re

        smj_kinds = set(re.findall(r"SortMergeJoin (\w+)", plan))
        assert smj_kinds <= {"FullOuter"}, plan
        assert "BroadcastHashJoin" in plan


class TestFrequentIVM:
    """Exact top-k-frequent maintenance from the support table — the
    delete-capable sibling of Misra-Gries: a delete can DEMOTE the
    front-runner and the runner-up must surface exactly."""

    @staticmethod
    def _ops():
        from mysql_syncer_spark.operators import incremental_agg as ia

        return ia

    @pytest.fixture(scope="class")
    def fbase(self, spark):
        ia = self._ops()
        rows = (
            [("a", "x")] * 3 + [("a", "y")] * 2 + [("a", "z")]
            + [("b", "p")] * 2 + [("b", "q")] * 2
        )
        base = spark.createDataFrame(rows, "k STRING, v STRING")
        sup = ia.value_support_snapshot(base, ["k"], "v")
        top = ia.frequent_values_from_support(sup, ["k"], "v", 2)
        return base, sup, top

    @staticmethod
    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    def test_snapshot_ranks_and_tiebreak(self, fbase):
        _, _, top = fbase
        got = self._rows(top)
        # a: x(3) > y(2); b: p(2) == q(2) -> value-asc tie-break
        assert got == [
            ("a", "x", 3, 1), ("a", "y", 2, 2),
            ("b", "p", 2, 1), ("b", "q", 2, 2),
        ]

    def test_delete_demotes_front_runner(self, spark, fbase):
        ia = self._ops()
        _, sup, top = fbase
        d = spark.createDataFrame(
            [("a", "x", -1), ("a", "x", -1)], "k STRING, v STRING, sign LONG"
        )
        sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
        top1 = ia.apply_frequent_delta(top, sup1, d, ["k"], "v", 2)
        got = self._rows(top1)
        # a: y(2) now leads, x(1) demoted to rank 2 (z ties at 1 but
        # value-asc puts x first); b untouched bit-identical
        assert ("a", "y", 2, 1) in got and ("a", "x", 1, 2) in got
        assert ("b", "p", 2, 1) in got and ("b", "q", 2, 2) in got

    def test_fold_equals_recompute_chained(self, spark, fbase):
        ia = self._ops()
        base, sup, top = fbase
        cur = [tuple(r) for r in base.collect()]
        batches = [
            [("a", "x", -1), ("b", "q", 1)],
            [("a", "z", 1), ("a", "z", 1), ("b", "p", -1), ("b", "p", -1)],
            [("c", "m", 1)],
        ]
        for batch in batches:
            d = spark.createDataFrame(batch, "k STRING, v STRING, sign LONG")
            sup = ia.apply_value_support_delta(sup, d, ["k"], "v")
            top = ia.apply_frequent_delta(top, sup, d, ["k"], "v", 2)
            for k, v, s in batch:
                cur.append((k, v)) if s > 0 else cur.remove((k, v))
            rec = ia.frequent_values_from_support(
                ia.value_support_snapshot(
                    spark.createDataFrame(cur, "k STRING, v STRING"),
                    ["k"], "v"),
                ["k"], "v", 2)
            assert self._rows(top) == self._rows(rec)

    def test_validation(self, fbase):
        ia = self._ops()
        _, sup, _ = fbase
        with pytest.raises(ValueError, match="k must be"):
            ia.frequent_values_from_support(sup, ["k"], "v", 0)


def test_support_fold_null_group_keys(spark):
    """NULL is a legitimate group (groupBy keeps it): folding a delta
    against a NULL-keyed group must retract/extend THAT group — a
    null-unsafe merge would split it into a false underflow plus a
    phantom insert, and the touched-group anti/semi would never reach
    it (regression for the null-safe `<=>` discipline)."""
    from mysql_syncer_spark.operators import incremental_agg as ia

    base = spark.createDataFrame(
        [(None, 5.0), (None, 9.0), ("a", 1.0)], "k STRING, v DOUBLE"
    )
    sup = ia.value_support_snapshot(base, ["k"], "v")
    ext = ia.extremum_snapshot(sup, ["k"], "v")
    d = spark.createDataFrame(
        [(None, 9.0, -1), (None, 2.0, 1)], "k STRING, v DOUBLE, sign LONG"
    )
    sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
    ext1 = ia.apply_extremum_delta(ext, sup1, d, ["k"], "v")
    got = {r["k"]: (r["min_v"], r["max_v"], r["n_values"])
           for r in ext1.collect()}
    assert got[None] == (2.0, 5.0, 2)   # 9 retracted, 2 inserted
    assert got["a"] == (1.0, 1.0, 1)    # untouched group intact
    top1 = ia.apply_frequent_delta(
        ia.frequent_values_from_support(sup, ["k"], "v", 1),
        sup1, d, ["k"], "v", 1,
    )
    gott = {r["k"]: r["value"] for r in top1.collect()}
    assert gott[None] == 2.0 and gott["a"] == 1.0


class TestDistinctIVM:
    """Exact distinct-count under deletes — the capability neither
    sketch leg offers (HLL can't delete; bitmap OR is insert-only):
    deleting a value's LAST occurrence decrements, deleting one of
    two does not."""

    def test_delete_last_occurrence_decrements(self, spark):
        from mysql_syncer_spark.operators import incremental_agg as ia

        base = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 3.0)],
            "k STRING, v DOUBLE",
        )
        sup = ia.value_support_snapshot(base, ["k"], "v")
        view = ia.distinct_from_support(sup, ["k"])
        got = {r["k"]: (r["n_distinct"], r["n_values"])
               for r in view.collect()}
        assert got == {"a": (2, 3), "b": (1, 1)}
        # delete ONE of the two 1.0s: distinct unchanged, values -1
        d1 = spark.createDataFrame(
            [("a", 1.0, -1)], "k STRING, v DOUBLE, sign LONG"
        )
        sup1 = ia.apply_value_support_delta(sup, d1, ["k"], "v")
        v1 = ia.apply_distinct_delta(view, sup1, d1, ["k"])
        got1 = {r["k"]: (r["n_distinct"], r["n_values"])
                for r in v1.collect()}
        assert got1 == {"a": (2, 2), "b": (1, 1)}
        # delete the LAST 1.0: distinct drops to 1
        sup2 = ia.apply_value_support_delta(sup1, d1, ["k"], "v")
        v2 = ia.apply_distinct_delta(v1, sup2, d1, ["k"])
        got2 = {r["k"]: (r["n_distinct"], r["n_values"])
                for r in v2.collect()}
        assert got2 == {"a": (1, 1), "b": (1, 1)}

    def test_fold_equals_recompute(self, spark):
        from mysql_syncer_spark.operators import incremental_agg as ia

        base = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 3.0)]
        batch = [("a", 2.0, -1), ("a", 9.0, 1), ("b", 3.0, -1),
                 ("c", 4.0, 1)]
        base_df = spark.createDataFrame(base, "k STRING, v DOUBLE")
        sup = ia.value_support_snapshot(base_df, ["k"], "v")
        view = ia.distinct_from_support(sup, ["k"])
        d = spark.createDataFrame(batch, "k STRING, v DOUBLE, sign LONG")
        sup1 = ia.apply_value_support_delta(sup, d, ["k"], "v")
        v1 = ia.apply_distinct_delta(view, sup1, d, ["k"])
        cur = [("a", 1.0), ("a", 9.0), ("b", 3.0), ("c", 4.0)]
        ref = ia.distinct_from_support(
            ia.value_support_snapshot(
                spark.createDataFrame(cur, "k STRING, v DOUBLE"),
                ["k"], "v"), ["k"])
        assert sorted(map(tuple, v1.collect())) == \
            sorted(map(tuple, ref.collect()))
