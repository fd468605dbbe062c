"""Numeric drift monitors: exact two-sample KS + binned PSI."""

import math

import pytest

from mysql_syncer_spark.operators.drift import ks_drift, psi_drift


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "value double")


class TestKsDrift:
    def test_hand_computed(self, spark):
        a = _vals(spark, [1, 2, 3, 4])
        b = _vals(spark, [3, 4, 5, 6])
        row = ks_drift(a, b, "value").collect()[0]
        # F_a jumps to 1.0 at v=4 while F_b is 2/4 -> D = 0.5
        assert row.n_a == 4 and row.n_b == 4
        assert abs(row.ks_stat - 0.5) < 1e-9

    def test_identical_distributions_zero(self, spark):
        a = _vals(spark, range(50))
        row = ks_drift(a, a, "value").collect()[0]
        assert row.ks_stat == 0.0

    def test_disjoint_distributions_one(self, spark):
        a = _vals(spark, range(0, 10))
        b = _vals(spark, range(100, 110))
        assert ks_drift(a, b, "value").collect()[0].ks_stat == 1.0

    def test_nulls_excluded(self, spark):
        a = spark.createDataFrame(
            [(1.0,), (None,), (2.0,)], "value double"
        )
        row = ks_drift(a, _vals(spark, [1, 2]), "value").collect()[0]
        assert row.n_a == 2 and row.ks_stat == 0.0


class TestPsiDrift:
    def test_hand_computed(self, spark):
        # 2 bins on [0, 10): a = 3 low 1 high, b = 1 low 3 high
        a = _vals(spark, [1, 2, 3, 7])
        b = _vals(spark, [2, 6, 7, 8])
        row = psi_drift(a, b, "value", lo=0.0, hi=10.0, bins=2).collect()[0]
        p_lo, p_hi = (3 + 1) / 6, (1 + 1) / 6
        q_lo, q_hi = (1 + 1) / 6, (3 + 1) / 6
        want = (p_lo - q_lo) * math.log(p_lo / q_lo) + (
            p_hi - q_hi
        ) * math.log(p_hi / q_hi)
        assert abs(row.psi - round(want, 9)) < 1e-9

    def test_identical_near_zero_and_shift_detected(self, spark):
        a = _vals(spark, range(100))
        shifted = _vals(spark, range(50, 150))
        same = psi_drift(a, a, "value", 0.0, 150.0, bins=10).collect()[0]
        moved = psi_drift(a, shifted, "value", 0.0, 150.0, 10).collect()[0]
        assert same.psi == 0.0
        assert moved.psi > 0.25  # "shifted" band

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        a = _vals(spark, [-100, 0.5, 999])
        row = psi_drift(a, a, "value", 0.0, 1.0, bins=2).collect()[0]
        assert row.n_a == 3 and row.psi == 0.0

    def test_validation(self, spark):
        a = _vals(spark, [1])
        with pytest.raises(ValueError):
            psi_drift(a, a, "value", 0.0, 1.0, bins=1)
        with pytest.raises(ValueError):
            psi_drift(a, a, "value", 2.0, 1.0)


class TestMWUDrift:
    """Mann-Whitney U drift (E144): U equals the pair-counting
    definition (#(a>b) + ties/2) on hand data, tie handling,
    stochastic-dominance flags, the all-tied degenerate case, NULL
    exclusion, and outlier robustness vs what a mean-based test sees."""

    def _mwu(self, spark, a_vals, b_vals):
        from mysql_syncer_spark.operators.drift import mwu_drift

        a = spark.createDataFrame([(v,) for v in a_vals], "value double")
        b = spark.createDataFrame([(v,) for v in b_vals], "value double")
        return mwu_drift(a, b, "value").first()

    def test_u_equals_pair_counting(self, spark):
        a_vals = [1.0, 3.0, 3.0, 7.0]
        b_vals = [2.0, 3.0, 5.0]
        r = self._mwu(spark, a_vals, b_vals)
        want_u = sum(
            1.0 if x > y else 0.5 if x == y else 0.0
            for x in a_vals for y in b_vals
        )
        assert (r["n_a"], r["n_b"], r["u_a"]) == (4, 3, want_u)

    def test_dominance_drifts(self, spark):
        # b strictly dominates a -> extreme z, flagged
        r = self._mwu(spark, [float(i) for i in range(50)],
                      [float(i + 100) for i in range(50)])
        assert r["u_a"] == 0.0 and r["drifted"] is True and r["z"] < -2.5758

    def test_all_tied_degenerate(self, spark):
        r = self._mwu(spark, [5.0] * 10, [5.0] * 10)
        assert r["z"] is None and r["drifted"] is False
        assert r["u_a"] == 50.0  # all ties at half credit

    def test_null_exclusion(self, spark):
        r = self._mwu(spark, [1.0, None, 2.0], [3.0, None])
        assert (r["n_a"], r["n_b"]) == (2, 1)

    def test_rank_saturation_vs_outlier(self, spark):
        """One enormous outlier moves U by at most its rank step —
        the same samples with/without the outlier blowup give nearly
        the same z (the robustness KS/mean tests don't have)."""
        base_a = [float(i) for i in range(1, 101)]
        base_b = [float(i) + 0.5 for i in range(1, 101)]
        z_plain = self._mwu(spark, base_a, base_b)["z"]
        z_poison = self._mwu(spark, base_a, base_b[:-1] + [1e12])["z"]
        assert abs(z_plain - z_poison) < 0.2


class TestRandomizationTest:
    """E175 deterministic randomization test (operators/stats.py)."""

    def test_detects_real_signal(self, spark):
        from mysql_syncer_spark.operators.stats import randomization_test

        rows = [(i, "a", 100.0 + (i % 7)) for i in range(200)]
        rows += [(1000 + i, "b", 0.0 + (i % 7)) for i in range(200)]
        df = spark.createDataFrame(rows, "k long, g string, v double")
        r = randomization_test(df, "g", "v", "k", n_perm=32).collect()[0]
        assert abs(r.diff_obs - 100.0) < 1e-6
        assert r.n_extreme == 0          # no null draw reaches a 100-gap
        assert r.p_value == round(1 / 33, 6)

    def test_null_signal_is_not_significant(self, spark):
        from mysql_syncer_spark.operators.stats import randomization_test

        import random

        rng = random.Random(5)
        rows = [(i, "a" if i % 2 else "b", rng.gauss(0, 1))
                for i in range(400)]
        df = spark.createDataFrame(rows, "k long, g string, v double")
        r = randomization_test(df, "g", "v", "k", n_perm=48).collect()[0]
        assert r.p_value > 0.02  # same distribution → not extreme

    def test_deterministic_and_salted(self, spark):
        from mysql_syncer_spark.operators.stats import randomization_test

        rows = [(i, "a" if i % 2 else "b", float(i % 13))
                for i in range(100)]
        df = spark.createDataFrame(rows, "k long, g string, v double")
        r1 = randomization_test(df, "g", "v", "k", n_perm=16).collect()
        r2 = randomization_test(df, "g", "v", "k", n_perm=16).collect()
        assert r1 == r2
        r3 = randomization_test(
            df, "g", "v", "k", n_perm=16, salt="x"
        ).collect()
        assert r1[0].diff_obs == r3[0].diff_obs  # observed unchanged

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.stats import randomization_test

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
            "k long, g string, v double",
        )
        with pytest.raises(ValueError, match="exactly 2 groups"):
            randomization_test(df, "g", "v", "k").collect()
        two = df.where("g != 'c'")
        with pytest.raises(ValueError, match="n_perm"):
            randomization_test(two, "g", "v", "k", n_perm=0)


class TestJSDivergence:
    """E190 Jensen-Shannon laws (operators/drift.py)."""

    def _run(self, spark, a_rows, b_rows, cats):
        from mysql_syncer_spark.operators.drift import js_divergence

        a = spark.createDataFrame([(x,) for x in a_rows], "c string")
        b = spark.createDataFrame([(x,) for x in b_rows], "c string")
        return js_divergence(a, b, "c", cats).first()

    def test_identical_mix_is_zero(self, spark):
        r = self._run(spark, ["x"] * 3 + ["y"], ["x"] * 6 + ["y"] * 2,
                      ["x", "y"])
        assert r.n_a == 4 and r.n_b == 8
        assert r.jsd == 0.0 and r.jsd_norm == 0.0

    def test_disjoint_mix_is_max(self, spark):
        # disjoint supports: JSD = ln 2, normalized = 1
        r = self._run(spark, ["x"] * 5, ["y"] * 7, ["x", "y"])
        import math

        assert abs(r.jsd - math.log(2)) < 1e-6
        assert r.jsd_norm == 1.0

    def test_hand_computed_and_out_of_list_excluded(self, spark):
        import math

        # a: (3/4, 1/4); b: (1/4, 3/4); m = (1/2, 1/2)
        # jsd = 0.5*(0.75 ln1.5 + 0.25 ln0.5) + 0.5*(0.25 ln0.5 + 0.75 ln1.5)
        expect = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
        r = self._run(
            spark,
            ["x"] * 3 + ["y"] + ["zz"] * 5,     # zz outside the list
            ["x"] + ["y"] * 3 + [None],
            ["x", "y"],
        )
        assert r.n_a == 4 and r.n_b == 4
        assert abs(r.jsd - expect) < 1e-6

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.drift import js_divergence

        df = spark.createDataFrame([("x",)], "c string")
        with _pytest.raises(ValueError, match=">= 2"):
            js_divergence(df, df, "c", ["x"])
        with _pytest.raises(ValueError, match="distinct"):
            js_divergence(df, df, "c", ["x", "x"])
