"""Closed-form stats (operators/stats.py): numpy-reference equality
on hand-built series, pairwise-complete NULL semantics, degenerate
cases (constant x, undersized pairs)."""

import numpy as np
import pytest

from mysql_syncer_spark.operators.stats import (
    correlation_matrix,
    group_trends,
)


def test_corr_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.randn(40)
    y = 2 * x + rng.randn(40) * 0.1   # strongly correlated
    z = rng.randn(40)                  # independent
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert got[("x", "y")] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-9)
    assert got[("x", "z")] == pytest.approx(np.corrcoef(x, z)[0, 1], abs=1e-9)
    assert abs(got[("x", "y")]) > 0.99 > abs(got[("x", "z")])


def test_corr_pairwise_complete_nulls_and_min_rows(spark):
    rows = [
        (1.0, 2.0, None),
        (2.0, 4.0, 1.0),
        (3.0, 6.0, None),
        (4.0, None, 2.0),
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    c, n = out[("x", "y")]
    assert n == 3 and c == pytest.approx(1.0)   # perfect on complete rows
    c, n = out[("x", "z")]
    assert n == 2                                # two complete pairs
    # y-z has ONE complete row: below min_rows -> NULL, not a number
    c, n = out[("y", "z")]
    assert n == 1 and c is None


def test_trends_match_numpy_polyfit(spark):
    xs = np.arange(30, dtype=float)
    ys = 3.5 * xs + 7.0 + np.sin(xs)  # near-linear
    rows = [("a", float(x), float(y)) for x, y in zip(xs, ys)] + [
        ("b", float(x), 5.0) for x in xs  # flat: slope 0, r2 undefined-ish
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: r for r in group_trends(df, ["g"], "x", "y").collect()
    }
    slope, intercept = np.polyfit(xs, ys, 1)
    assert got["a"]["slope"] == pytest.approx(slope, abs=1e-9)
    assert got["a"]["intercept"] == pytest.approx(intercept, abs=1e-9)
    assert got["a"]["r2"] > 0.999 and got["a"]["n"] == 30
    assert got["b"]["slope"] == pytest.approx(0.0, abs=1e-12)


def test_trend_constant_x_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 1.0, 2.0)], "g string, x double, y double"
    )
    r = group_trends(df, ["g"], "x", "y").first()
    assert r["slope"] is None  # vertical fit undefined


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="two value columns"):
        correlation_matrix(df, ["x"])


class TestMADOutliers:
    """Median/MAD robust outliers (E137): hand-computed medians (odd,
    even, discrete rule), the poisoning-resistance property z-scores
    lack, MAD==0 degenerate semantics, NULL exclusion, validation."""

    def test_discrete_median_rule(self, spark):
        from mysql_syncer_spark.operators.stats import group_median_disc

        # odd group: middle; even group: LOWER middle (ceil(n/2))
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 9.0), ("a", 5.0),
             ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)],
            "g string, v double",
        )
        got = {
            r["g"]: r["med"]
            for r in group_median_disc(df, ["g"], "v", "med").collect()
        }
        assert got == {"a": 5.0, "b": 2.0}

    def test_hand_computed_outliers(self, spark):
        from mysql_syncer_spark.operators.stats import mad_outliers

        # med=5, devs {4,1,0,1,4,95} -> mad=median(0,1,1,4,4,95)=1
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 4.0), ("a", 5.0), ("a", 6.0), ("a", 9.0),
             ("a", 100.0)],
            "g string, v double",
        )
        rows = {
            r["v"]: (r["med"], r["mad"], r["outlier"])
            for r in mad_outliers(df, ["g"], "v", c=3.0).collect()
        }
        assert rows[100.0] == (5.0, 1.0, True)
        assert rows[9.0] == (5.0, 1.0, True)     # dev 4 > 3*1
        assert rows[6.0] == (5.0, 1.0, False)
        assert rows[1.0] == (5.0, 1.0, True)

    def test_poisoning_resistance(self, spark):
        """One enormous value must not drag the reference point: the
        contaminated group still flags ONLY the contaminator (the
        z-score screen, by contrast, has its stddev inflated ~sqrt(n)
        by the same point and can miss it)."""
        from mysql_syncer_spark.operators.stats import mad_outliers

        vals = [float(v) for v in range(1, 20)] + [1e9]
        df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
        out = mad_outliers(df, ["g"], "v", c=3.0)
        flagged = sorted(r["v"] for r in out.where("outlier").collect())
        assert 1e9 in flagged
        assert all(v >= 18.0 or v <= 2.0 for v in flagged if v != 1e9)
        # med/mad unmoved by the poison point
        r = out.where("v = 1e9").first()
        assert r["med"] == 10.0 and r["mad"] == 5.0

    def test_mad_zero_flags_any_deviation(self, spark):
        from mysql_syncer_spark.operators.stats import mad_outliers

        df = spark.createDataFrame(
            [("a", 2.0)] * 5 + [("a", 3.0)], "g string, v double"
        )
        rows = {r["v"]: r["outlier"] for r in
                mad_outliers(df, ["g"], "v").collect()}
        assert rows[3.0] is True and rows[2.0] is False

    def test_null_exclusion_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import (
            group_median_disc,
            mad_outliers,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
        )
        assert mad_outliers(df, ["g"], "v").count() == 2
        # NULLs excluded BEFORE the rank: median of {1,3} = 1 (lower)
        got = group_median_disc(df, ["g"], "v", "m").first()["m"]
        assert got == 1.0
        with _pytest.raises(ValueError, match="c must"):
            mad_outliers(df, ["g"], "v", c=0)
        with _pytest.raises(ValueError, match="group_cols"):
            group_median_disc(df, [], "v", "m")


class TestTheilSen:
    """Theil-Sen robust trend (E146): exact slope on clean lines, the
    contamination-resistance property OLS lacks, < 2-point groups,
    NULL exclusion, validation."""

    def test_exact_on_clean_line(self, spark):
        from mysql_syncer_spark.operators.stats import theil_sen

        df = spark.createDataFrame(
            [("g", float(x), 2.0 * x + 1.0) for x in range(10)],
            "g string, x double, y double",
        )
        r = theil_sen(df, ["g"], "x", "y").first()
        assert (r["n_points"], r["n_pairs"], r["slope"]) == (10, 45, 2.0)

    def test_contamination_resistance_vs_ols(self, spark):
        """One wild point: OLS slope moves by orders of magnitude,
        Theil-Sen stays at the clean slope (every pair involving the
        outlier is outvoted in the median)."""
        from mysql_syncer_spark.operators.stats import (
            group_trends,
            theil_sen,
        )

        pts = [("g", float(x), 2.0 * x) for x in range(20)]
        pts[10] = ("g", 10.0, 1e6)  # corrupted day
        df = spark.createDataFrame(pts, "g string, x double, y double")
        ts = theil_sen(df, ["g"], "x", "y").first()["slope"]
        ols = group_trends(df, ["g"], "x", "y").first()["slope"]
        assert abs(ts - 2.0) < 0.3
        assert abs(ols - 2.0) > 100  # OLS followed the poison point

    def test_small_groups_and_nulls(self, spark):
        from mysql_syncer_spark.operators.stats import theil_sen

        df = spark.createDataFrame(
            [("one", 1.0, 5.0),
             ("two", 1.0, 1.0), ("two", 2.0, None), ("two", 3.0, 5.0)],
            "g string, x double, y double",
        )
        got = {
            r["g"]: (r["n_points"], r["n_pairs"], r["slope"])
            for r in theil_sen(df, ["g"], "x", "y").collect()
        }
        assert got["one"] == (1, 0, None)       # no pair exists
        assert got["two"] == (2, 1, 2.0)        # NULL y excluded

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import theil_sen

        df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, x double, y double")
        with _pytest.raises(ValueError, match="group_cols"):
            theil_sen(df, [], "x", "y")


class TestCategoryEntropy:
    """Categorical-mix entropy (E147): uniform = ln k (norm 1),
    collapsed = 0, hand-computed mixed case, out-of-list counting,
    0·ln0 handling, validation."""

    def test_uniform_and_collapsed(self, spark):
        import math

        from mysql_syncer_spark.operators.stats import category_entropy

        rows = [("u", c) for c in ("a", "b", "c", "d")] * 5
        rows += [("k", "a")] * 8
        df = spark.createDataFrame(rows, "g string, cat string")
        got = {
            r["g"]: (r["n_rows"], r["entropy"], r["norm_entropy"])
            for r in category_entropy(
                df, ["g"], "cat", ["a", "b", "c", "d"]
            ).collect()
        }
        assert got["u"] == (20, round(math.log(4), 6), 1.0)
        assert got["k"] == (8, 0.0, 0.0)  # 0*ln0 terms contribute 0

    def test_hand_computed_mixed(self, spark):
        import math

        from mysql_syncer_spark.operators.stats import category_entropy

        # 3 of 'a', 1 of 'b': H = -(3/4 ln 3/4 + 1/4 ln 1/4)
        df = spark.createDataFrame(
            [("g", "a")] * 3 + [("g", "b")], "g string, cat string"
        )
        r = category_entropy(df, ["g"], "cat", ["a", "b"]).first()
        want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert r["entropy"] == round(want, 6)
        assert r["norm_entropy"] == round(want / math.log(2), 6)

    def test_out_of_list_excluded_from_mix(self, spark):
        from mysql_syncer_spark.operators.stats import category_entropy

        df = spark.createDataFrame(
            [("g", "a"), ("g", "a"), ("g", "zzz")], "g string, cat string"
        )
        r = category_entropy(df, ["g"], "cat", ["a", "b"]).first()
        assert (r["n_rows"], r["n_other"], r["entropy"]) == (2, 1, 0.0)

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import category_entropy

        df = spark.createDataFrame([("g", "a")], "g string, cat string")
        with _pytest.raises(ValueError, match="group_cols"):
            category_entropy(df, [], "cat", ["a", "b"])
        with _pytest.raises(ValueError, match=">= 2 categories"):
            category_entropy(df, ["g"], "cat", ["a"])
        with _pytest.raises(ValueError, match="distinct"):
            category_entropy(df, ["g"], "cat", ["a", "a"])


class TestPropZTest:
    """Two-proportion z-test (E148): hand-computed z, significance at
    a real effect, degenerate pools, NULL exclusion."""

    def _run(self, spark, a_flags, b_flags):
        from mysql_syncer_spark.operators.stats import prop_ztest

        a = spark.createDataFrame([(f,) for f in a_flags], "s boolean")
        b = spark.createDataFrame([(f,) for f in b_flags], "s boolean")
        return prop_ztest(a, b, "s").first()

    def test_hand_computed(self, spark):
        import math

        # a: 30/100, b: 20/100 -> pool 0.25
        r = self._run(spark, [True] * 30 + [False] * 70,
                      [True] * 20 + [False] * 80)
        pool = 0.25
        var = pool * 0.75 * (1 / 100 + 1 / 100)
        want = (0.3 - 0.2) / math.sqrt(var)
        assert (r["n_a"], r["n_b"], r["p_a"], r["p_b"]) == (100, 100, 0.3, 0.2)
        assert r["z"] == round(want, 6)
        assert r["significant"] is False  # z ~ 1.63 < 2.5758

    def test_large_effect_significant(self, spark):
        r = self._run(spark, [True] * 300 + [False] * 200,
                      [True] * 100 + [False] * 400)
        assert r["significant"] is True and r["z"] > 2.5758

    def test_degenerate_pool(self, spark):
        r = self._run(spark, [True] * 5, [True] * 5)
        assert r["z"] is None and r["significant"] is False
        r0 = self._run(spark, [False] * 5, [False] * 5)
        assert r0["z"] is None and r0["significant"] is False

    def test_null_exclusion(self, spark):
        r = self._run(spark, [True, None, False], [False, None])
        assert (r["n_a"], r["n_b"]) == (2, 1)


def test_corr_underscore_column_names_no_alias_collision(spark):
    """Regression: cells used to alias as __c_{a}_{b}, which collides
    for name pairs like ('a','b_x') vs ('a_b','x'); aliases are now by
    pair index."""
    from mysql_syncer_spark.operators.stats import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 1.0, 2.0), (2.0, 4.0, 2.0, 4.0), (3.0, 5.0, 3.0, 7.0)],
        "a double, b_x double, a_b double, x double",
    )
    out = correlation_matrix(df, ["a", "b_x", "a_b", "x"]).collect()
    assert len(out) == 6
    cell = {(r["col_a"], r["col_b"]): r for r in out}
    assert cell[("a", "a_b")]["corr"] == pytest.approx(1.0)
    assert all(r["n"] == 3 for r in out)


def test_entropy_null_categories_counted_in_other(spark):
    """Regression: NULL category rows fell through the bare ~isin()
    predicate and were counted nowhere; they now count in n_other."""
    from mysql_syncer_spark.operators.stats import category_entropy

    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", None), ("g", "zzz")],
        "g string, cat string",
    )
    r = category_entropy(df, ["g"], "cat", ["a", "b"]).first()
    assert (r["n_rows"], r["n_other"]) == (2, 2)


def test_pq_train_empty_corpus_raises_clear_error(spark):
    from mysql_syncer_spark.operators.similarity import pq_train

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty, m=2, nbits=2)


class TestPoissonBootstrap:
    """E179 Poisson-bootstrap CI laws (operators/stats.py)."""

    def _df(self, spark, n=2000):
        # group a ~ N-ish around 10 (deterministic ramp), group b around 50
        rows = [("a", 10.0 + (i % 21 - 10) * 0.1, i) for i in range(n)]
        rows += [("b", 50.0 + (i % 21 - 10) * 0.5, n + i) for i in range(n)]
        return spark.createDataFrame(rows, "g string, v double, k long")

    def test_ci_brackets_mean_and_widths_scale(self, spark):
        from mysql_syncer_spark.operators.stats import poisson_bootstrap_ci

        df = self._df(spark)
        out = {r.g: r for r in poisson_bootstrap_ci(
            df, ["g"], "v", "k", n_boot=32).collect()}
        for g, true_mean in (("a", 10.0), ("b", 50.0)):
            r = out[g]
            assert r.ci_lo <= r.mean_v <= r.ci_hi, r
            assert abs(r.mean_v - true_mean) < 0.1
            assert r.n == 2000
        # group b has 5x the spread — its CI must be wider
        wa = out["a"].ci_hi - out["a"].ci_lo
        wb = out["b"].ci_hi - out["b"].ci_lo
        assert wb > wa

    def test_zero_weight_replicates_guarded_and_oracle_exact(self, spark):
        """ADVICE r11: a (group, replicate) cell where every row drew
        weight 0 (P ~ 0.368**n, realistic for tiny groups) is an empty
        resample. Unguarded, Spark's 0/0 gave NULL while DuckDB's IEEE
        0/0 gave NaN — and they rank differently. The guard makes the
        mean NULL in BOTH engines with pinned NULLS FIRST placement, so
        single-row groups still agree exactly with the mirror."""
        import duckdb

        from mysql_syncer_spark.operators.stats import (
            duckdb_pois1_weight_sql,
            poisson_bootstrap_ci,
        )

        rows = [(f"g{i}", 10.0 + i, i) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, v double, k long")
        got = {
            r.g: (r.mean_v, r.ci_lo, r.ci_hi, r.n)
            for r in poisson_bootstrap_ci(
                df, ["g"], "v", "k", n_boot=32
            ).collect()
        }
        # empty replicates exist (rank 2 is a NULL cell) and nothing
        # is NaN; non-empty single-row resamples always mean to v
        assert all(lo is None for (_, lo, _, _) in got.values())
        assert all(hi == m for (m, _, hi, _) in got.values())
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (g VARCHAR, v DOUBLE, k BIGINT)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        h3 = (
            "substr(md5(CAST(k AS VARCHAR) || ':' || "
            "CAST(b // 10 AS VARCHAR)), (b % 10) * 3 + 1, 3)"
        )
        w = duckdb_pois1_weight_sql(h3)
        oracle = con.execute(f"""
            WITH base AS (
              SELECT g, CAST(FLOOR(v * 1000000.0) AS BIGINT) AS v6, k
              FROM t WHERE v IS NOT NULL),
            rep AS (
              SELECT g, v6, k, b, {w} AS w FROM base CROSS JOIN (
                SELECT unnest(generate_series(0, 31)) AS b)),
            cells AS (
              SELECT g, b, CASE WHEN SUM(w) > 0 THEN
                ROUND(CAST(SUM(w * v6) AS DOUBLE) / 1000000.0
                      / CAST(SUM(w) AS DOUBLE), 6) END AS bm
              FROM rep GROUP BY 1, 2),
            ranked AS (
              SELECT g, b, bm, ROW_NUMBER() OVER (PARTITION BY g
                ORDER BY bm NULLS FIRST, b) AS r FROM cells),
            ci AS (
              SELECT g, MAX(CASE WHEN r = 2 THEN bm END) AS ci_lo,
                     MAX(CASE WHEN r = 31 THEN bm END) AS ci_hi
              FROM ranked GROUP BY 1),
            pt AS (
              SELECT g, ROUND(CAST(SUM(v6) AS DOUBLE) / 1000000.0
                        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_v,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM base GROUP BY 1)
            SELECT pt.g, mean_v, ci_lo, ci_hi, n
            FROM pt JOIN ci USING (g)""").fetchall()
        assert {r[0]: tuple(r[1:]) for r in oracle} == got

    def test_deterministic_and_salt_redraws(self, spark):
        from mysql_syncer_spark.operators.stats import poisson_bootstrap_ci

        df = self._df(spark, n=500)
        a = sorted(map(tuple, poisson_bootstrap_ci(
            df, ["g"], "v", "k").collect()))
        b = sorted(map(tuple, poisson_bootstrap_ci(
            df, ["g"], "v", "k").collect()))
        c = sorted(map(tuple, poisson_bootstrap_ci(
            df, ["g"], "v", "k", salt="2").collect()))
        assert a == b
        assert a != c

    def test_ci_narrows_with_n(self, spark):
        from mysql_syncer_spark.operators.stats import poisson_bootstrap_ci

        small = self._df(spark, n=200)
        big = self._df(spark, n=5000)
        ws = {r.g: r.ci_hi - r.ci_lo for r in poisson_bootstrap_ci(
            small, ["g"], "v", "k").collect()}
        wb = {r.g: r.ci_hi - r.ci_lo for r in poisson_bootstrap_ci(
            big, ["g"], "v", "k").collect()}
        # sqrt(n) shrinkage: 25x the rows -> ~5x narrower (allow slack)
        assert wb["a"] < ws["a"] / 2
        assert wb["b"] < ws["b"] / 2

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import poisson_bootstrap_ci

        with _pytest.raises(ValueError, match="n_boot"):
            poisson_bootstrap_ci(self._df(spark), ["g"], "v", "k", n_boot=2)


class TestChi2Independence:
    """E186 χ² independence laws (operators/stats.py)."""

    def _run(self, spark, rows, cats_a, cats_b):
        from mysql_syncer_spark.operators.stats import chi2_independence

        df = spark.createDataFrame(rows, "a string, b string")
        return chi2_independence(df, "a", "b", cats_a, cats_b).first()

    def test_independent_table_scores_zero(self, spark):
        # perfectly proportional 2x2: (x,y) counts 2/4/3/6 — rows are
        # exact multiples, expected == observed, chi2 == 0
        rows = (
            [("x", "u")] * 2 + [("x", "v")] * 4
            + [("y", "u")] * 3 + [("y", "v")] * 6
        )
        r = self._run(spark, rows, ["x", "y"], ["u", "v"])
        assert r.n_rows == 15
        assert r.chi2 == 0.0 and r.cramers_v == 0.0
        assert r.dof == 1

    def test_known_value_and_exclusions(self, spark):
        # hand-computed 2x2: cells 10/20/20/10, n=60; rows 30/30,
        # cols 30/30, expected 15 everywhere; chi2 = 4*(25/15) = 20/3
        rows = (
            [("x", "u")] * 10 + [("x", "v")] * 20
            + [("y", "u")] * 20 + [("y", "v")] * 10
            + [("z", "u")] * 5      # outside cats_a: excluded
            + [(None, "v")] * 2
        )
        r = self._run(spark, rows, ["x", "y"], ["u", "v"])
        assert r.n_rows == 60
        assert abs(r.chi2 - 20.0 / 3.0) < 1e-6
        # V = sqrt(chi2 / (n * 1))
        assert abs(r.cramers_v - (20.0 / 3.0 / 60.0) ** 0.5) < 1e-6

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import chi2_independence

        df = spark.createDataFrame([("x", "u")], "a string, b string")
        with _pytest.raises(ValueError, match=">= 2"):
            chi2_independence(df, "a", "b", ["x"], ["u", "v"])
        with _pytest.raises(ValueError, match="distinct"):
            chi2_independence(df, "a", "b", ["x", "x"], ["u", "v"])


class TestConcentrationProfile:
    """E187 concentration laws (operators/stats.py)."""

    def _run(self, spark, counts):
        from mysql_syncer_spark.operators.stats import (
            concentration_profile,
        )

        rows = [
            ("g", f"s{i}") for i, c in enumerate(counts) for _ in range(c)
        ]
        df = spark.createDataFrame(rows, "lang string, source string")
        return concentration_profile(df, ["lang"], "source").first()

    def test_uniform_mix_gini_zero(self, spark):
        r = self._run(spark, [5, 5, 5, 5])
        assert r.n_rows == 20 and r.n_items == 4
        assert r.gini == 0.0
        assert abs(r.hhi - 0.25) < 1e-6
        assert abs(r.top_share - 0.25) < 1e-6

    def test_single_item_degenerate(self, spark):
        r = self._run(spark, [7])
        assert r.gini == 0.0 and r.hhi == 1.0 and r.top_share == 1.0

    def test_skewed_mix_hand_computed(self, spark):
        # counts 1, 9 sorted asc -> ranks 1,2: gini =
        # (2*(1*1+2*9) - 3*10) / (2*10) = (38-30)/20 = 0.4
        r = self._run(spark, [9, 1])
        assert abs(r.gini - 0.4) < 1e-6
        assert abs(r.hhi - (81 + 1) / 100.0) < 1e-6
        assert abs(r.top_share - 0.9) < 1e-6

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import (
            concentration_profile,
        )

        df = spark.createDataFrame([("a", "b")], "lang string, source string")
        with _pytest.raises(ValueError, match="non-empty"):
            concentration_profile(df, [], "source")


class TestCohensKappa:
    """E188 Cohen's κ laws (operators/stats.py)."""

    def _run(self, spark, pairs, cats):
        from mysql_syncer_spark.operators.stats import cohens_kappa

        df = spark.createDataFrame(pairs, "t string, p string")
        return cohens_kappa(df, "t", "p", cats).first()

    def test_perfect_agreement(self, spark):
        pairs = [("a", "a")] * 3 + [("b", "b")] * 7
        r = self._run(spark, pairs, ["a", "b"])
        assert r.n_rows == 10 and r.agreement == 1.0 and r.kappa == 1.0

    def test_chance_only_agreement_is_zero(self, spark):
        # marginals 50/50 on both raters, agreement exactly 0.5 ==
        # expected agreement -> kappa 0
        pairs = (
            [("a", "a")] * 5 + [("a", "b")] * 5
            + [("b", "a")] * 5 + [("b", "b")] * 5
        )
        r = self._run(spark, pairs, ["a", "b"])
        assert r.agreement == 0.5
        assert r.expected_agreement == 0.5
        assert r.kappa == 0.0

    def test_hand_computed_with_exclusions(self, spark):
        # 2x2 confusion: aa=4, ab=1, ba=2, bb=3; n=10, agree=7
        # r=(5,5), p=(6,4); rc=30+20=50; kappa=(70-50)/(100-50)=0.4
        pairs = (
            [("a", "a")] * 4 + [("a", "b")] * 1
            + [("b", "a")] * 2 + [("b", "b")] * 3
            + [("c", "a")] * 2 + [(None, "b")]   # excluded
        )
        r = self._run(spark, pairs, ["a", "b"])
        assert r.n_rows == 10 and r.n_excluded == 3
        assert abs(r.kappa - 0.4) < 1e-6
        assert abs(r.agreement - 0.7) < 1e-6
        assert abs(r.expected_agreement - 0.5) < 1e-6


class TestKaplanMeier:
    """E194 Kaplan-Meier laws (operators/stats.py)."""

    def _run(self, spark, obs, probes):
        from mysql_syncer_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame(obs, "dur long, evt int")
        return {
            r.probe: r
            for r in kaplan_meier(df, "dur", "evt", probes).collect()
        }

    def test_hand_computed_with_censoring(self, spark):
        # events at 1, 2, 3; one CENSORED at 2:
        # S(1) = 3/4; S(2) = 3/4 * 2/3 = 1/2 (the censored row left
        # the risk set without dying); S(3): last subject dies ->
        # d == n -> survival exactly 0 (the ln-guard branch)
        obs = [(1, 1), (2, 1), (2, 0), (3, 1)]
        out = self._run(spark, obs, [1, 2, 3])
        assert out[1].survival == 0.75 and out[1].n_risk == 4
        assert out[2].survival == 0.5 and out[2].n_risk == 3
        assert out[3].survival == 0.0 and out[3].n_risk == 1

    def test_censoring_is_not_an_event(self, spark):
        # all-censored data: survival never drops
        obs = [(5, 0), (10, 0), (20, 0)]
        out = self._run(spark, obs, [30])
        # no event time <= probe: the probe row carries NULLs
        assert out[30].survival is None
        # with one real event at 10: S = (1 - 1/2) at risk {10,20}
        obs = [(5, 0), (10, 1), (20, 0)]
        out = self._run(spark, obs, [30])
        assert out[30].survival == 0.5 and out[30].n_risk == 2

    def test_probe_picks_latest_event_time(self, spark):
        obs = [(1, 1)] * 1 + [(4, 1)] + [(9, 1)] + [(10, 0)]
        out = self._run(spark, obs, [5])
        # probe 5 reads the S at t=4, not t=9
        assert out[5].survival == 0.5  # 3/4 * 2/3

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame([(1, 1)], "dur long, evt int")
        with _pytest.raises(ValueError, match="non-empty"):
            kaplan_meier(df, "dur", "evt", [])
        with _pytest.raises(ValueError, match="distinct"):
            kaplan_meier(df, "dur", "evt", [1, 1])
