"""k-anonymity + l-diversity (operators/privacy.py): hand-computed
cell audits, the generalization-monotonicity law (coarsening only
merges cells, so min cell size never decreases), NULL-as-a-cell-value,
the homogeneity attack k-anonymity misses, and the release gates."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.privacy import (
    generalize_numeric,
    generalize_prefix,
    k_anonymity_cells,
    k_anonymity_report,
    l_diversity_cells,
    l_diversity_report,
)

ROWS = [
    # (nation, zip, age): one big cell, one pair, two singletons
    ("US", "94110", 30), ("US", "94110", 30), ("US", "94110", 30),
    ("US", "94112", 31), ("US", "94112", 31),
    ("DE", "10115", 40),
    ("FR", None, 50),
]


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(ROWS, "nation string, zip string, age int")


def test_cells_and_report(people):
    cells = {
        (r["nation"], r["zip"], r["age"]): (r["n_rows"], r["risky"])
        for r in k_anonymity_cells(people, ["nation", "zip", "age"], 3).collect()
    }
    assert cells[("US", "94110", 30)] == (3, False)
    assert cells[("US", "94112", 31)] == (2, True)
    assert cells[("DE", "10115", 40)] == (1, True)
    assert cells[("FR", None, 50)] == (1, True)  # NULL is a cell value
    rep = k_anonymity_report(people, ["nation", "zip", "age"], 3).first()
    assert rep["n_cells"] == 4
    assert rep["n_risky_cells"] == 3
    assert rep["rows_at_risk"] == 4
    assert rep["min_cell_size"] == 1
    assert rep["k_anonymous"] is False


def test_generalization_monotonicity(people):
    """Coarsening quasi-identifiers only MERGES cells: min cell size is
    non-decreasing along the repair loop, and a full generalization
    reaches k-anonymity."""
    def min_cell(df, cols):
        return k_anonymity_report(df, cols, 3).first()["min_cell_size"]

    base = min_cell(people, ["nation", "zip", "age"])
    zip3 = people.withColumn("zip", generalize_prefix("zip", 3))
    banded = zip3.withColumn("age", generalize_numeric("age", 20))
    assert min_cell(zip3, ["nation", "zip", "age"]) >= base
    assert min_cell(banded, ["nation", "zip", "age"]) >= base
    # drop to nation only: US cell reaches 5 but DE/FR stay singletons
    rep = k_anonymity_report(people, ["nation"], 3).first()
    assert rep["n_risky_cells"] == 2 and rep["rows_at_risk"] == 2


def test_generalize_values(spark):
    df = spark.createDataFrame([(1234, "94110"), (-50, "ab")], "n long, s string")
    r = df.select(
        generalize_numeric("n", 1000).alias("band"),
        generalize_prefix("s", 3).alias("pfx"),
    ).collect()
    assert (r[0]["band"], r[0]["pfx"]) == (1000, "941")
    assert (r[1]["band"], r[1]["pfx"]) == (-1000, "ab")  # floor, short str


DIAG_ROWS = [
    # (nation, zip, diagnosis): the homogeneity attack — the US/94110
    # cell is k-anonymous at k=3 yet every row shares one diagnosis.
    ("US", "94110", "flu"), ("US", "94110", "flu"), ("US", "94110", "flu"),
    ("US", "94112", "flu"), ("US", "94112", "cold"),
    ("DE", "10115", None),  # NULL sensitive discloses nothing
]


@pytest.fixture(scope="module")
def patients(spark):
    return spark.createDataFrame(
        DIAG_ROWS, "nation string, zip string, diagnosis string"
    )


def test_l_diversity_homogeneity_attack(patients):
    """The cell k-anonymity passes (n_rows=3 >= k=3) is exactly the one
    l-diversity flags (one distinct diagnosis < l=2)."""
    k_cells = {
        (r["nation"], r["zip"]): r["risky"]
        for r in k_anonymity_cells(patients, ["nation", "zip"], 3).collect()
    }
    assert k_cells[("US", "94110")] is False  # k-anonymous...
    cells = {
        (r["nation"], r["zip"]): (r["n_rows"], r["diversity"], r["risky"])
        for r in l_diversity_cells(
            patients, ["nation", "zip"], "diagnosis", 2
        ).collect()
    }
    assert cells[("US", "94110")] == (3, 1, True)  # ...yet homogeneous
    assert cells[("US", "94112")] == (2, 2, False)
    # NULL sensitive values are excluded from the diversity count
    assert cells[("DE", "10115")] == (1, 0, True)


def test_l_diversity_report(patients):
    rep = l_diversity_report(patients, ["nation", "zip"], "diagnosis", 2).first()
    assert rep["n_cells"] == 3
    assert rep["n_risky_cells"] == 2
    assert rep["rows_at_risk"] == 4
    assert rep["min_diversity"] == 0
    assert rep["l_diverse"] is False
    # l=2 over the diverse cell only
    ok = l_diversity_report(
        patients.where(F.col("zip") == "94112"), ["zip"], "diagnosis", 2
    ).first()
    assert ok["l_diverse"] is True and ok["n_risky_cells"] == 0


def test_l_diversity_validation(patients):
    with pytest.raises(ValueError, match="l must"):
        l_diversity_cells(patients, ["nation"], "diagnosis", 1)
    with pytest.raises(ValueError, match="quasi_cols"):
        l_diversity_cells(patients, [], "diagnosis", 2)
    with pytest.raises(ValueError, match="cannot be a quasi"):
        l_diversity_cells(patients, ["nation"], "nation", 2)


def test_validation(people):
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_cells(people, ["nation"], 1)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_cells(people, [], 3)
    with pytest.raises(ValueError, match="width"):
        generalize_numeric("n", 0)
    with pytest.raises(ValueError, match="length"):
        generalize_prefix("s", 0)


class TestTCloseness:
    """t-closeness: per-cell distance from the sensitive-value
    distribution to the global baseline — the skewness attack
    l-diversity misses (a cell can be l-diverse yet 95% one rare
    value). Both variants are checked against an independent
    Fraction-based reference (exact rational arithmetic), which the
    integer-numerator implementation must match to float precision of
    the single final division."""

    # groups g1: [a,a,b]  g2: [b,b,c,c]  -> global a:2 b:3 c:2, N=7
    TROWS = [
        ("g1", "a"), ("g1", "a"), ("g1", "b"),
        ("g2", "b"), ("g2", "b"), ("g2", "c"), ("g2", "c"),
    ]

    @staticmethod
    def _ref_tvd(cell_vals, glob_vals):
        from fractions import Fraction

        n_c, big_n = len(cell_vals), len(glob_vals)
        dom = sorted(set(glob_vals))
        tot = Fraction(0)
        for v in dom:
            p = Fraction(cell_vals.count(v), n_c)
            q = Fraction(glob_vals.count(v), big_n)
            tot += abs(p - q)
        return tot / 2

    @staticmethod
    def _ref_ordered(cell_vals, glob_vals):
        from fractions import Fraction

        n_c, big_n = len(cell_vals), len(glob_vals)
        dom = sorted(set(glob_vals))
        m = len(dom)
        if m == 1:
            return Fraction(0)
        cum, tot = Fraction(0), Fraction(0)
        for v in dom:
            cum += Fraction(cell_vals.count(v), n_c) - Fraction(
                glob_vals.count(v), big_n)
            tot += abs(cum)
        return tot / (m - 1)

    def test_categorical_matches_rational_reference(self, spark):
        from mysql_syncer_spark.operators.privacy import t_closeness_cells

        df = spark.createDataFrame(self.TROWS, "g STRING, s STRING")
        out = {r["g"]: r for r in
               t_closeness_cells(df, ["g"], "s", t=0.2).collect()}
        glob = [s for _, s in self.TROWS]
        for g in ("g1", "g2"):
            cell = [s for k, s in self.TROWS if k == g]
            want = float(self._ref_tvd(cell, glob))
            assert abs(out[g]["emd"] - want) < 1e-12
            assert out[g]["n_rows"] == len(cell)
            assert out[g]["risky"] == (want > 0.2)

    def test_ordered_matches_rational_reference(self, spark):
        from mysql_syncer_spark.operators.privacy import (
            t_closeness_ordered_cells,
        )

        rows = [
            ("x", 1), ("x", 3),          # mass at the extremes
            ("y", 1), ("y", 2),          # adjacent mass
            ("z", 1), ("z", 2), ("z", 3),
        ]
        df = spark.createDataFrame(rows, "g STRING, s LONG")
        out = {r["g"]: r for r in
               t_closeness_ordered_cells(df, ["g"], "s", t=0.1).collect()}
        glob = [s for _, s in rows]
        for g in ("x", "y", "z"):
            cell = [s for k, s in rows if k == g]
            want = float(self._ref_ordered(cell, glob))
            assert abs(out[g]["emd"] - want) < 1e-12

    def test_ordered_sees_rank_distance_categorical_cannot(self, spark):
        """Two cells with the SAME categorical distance to baseline but
        different rank spread: the ordered metric must separate them."""
        from mysql_syncer_spark.operators.privacy import (
            t_closeness_cells,
            t_closeness_ordered_cells,
        )

        # global uniform over {1,2,3}; cell 'far' holds {1,3}, cell
        # 'near' holds {1,2}: same TVD, different ordered EMD
        rows = ([("far", 1), ("far", 3), ("near", 1), ("near", 2)]
                + [("pad", v) for v in (2, 3)])
        df = spark.createDataFrame(rows, "g STRING, s LONG")
        cat = {r["g"]: r["emd"] for r in
               t_closeness_cells(df, ["g"], "s", t=0.5).collect()}
        assert abs(cat["far"] - cat["near"]) < 1e-12
        orde = {r["g"]: r["emd"] for r in
                t_closeness_ordered_cells(df, ["g"], "s", t=0.5).collect()}
        assert orde["near"] > orde["far"]  # 1&2 vs baseline drifts more
        # cross-check both against the rational reference
        glob = [s for _, s in rows]
        for g in ("far", "near"):
            cell = [s for k, s in rows if k == g]
            assert abs(orde[g] - float(self._ref_ordered(cell, glob))) \
                < 1e-12

    def test_null_sensitive_excluded(self, spark):
        from mysql_syncer_spark.operators.privacy import t_closeness_cells

        df = spark.createDataFrame(
            self.TROWS + [("g1", None)], "g STRING, s STRING"
        )
        base = spark.createDataFrame(self.TROWS, "g STRING, s STRING")
        a = {r["g"]: (r["emd"], r["n_rows"]) for r in
             t_closeness_cells(df, ["g"], "s", 0.2).collect()}
        b = {r["g"]: (r["emd"], r["n_rows"]) for r in
             t_closeness_cells(base, ["g"], "s", 0.2).collect()}
        assert a == b

    def test_single_value_domain_is_zero(self, spark):
        from mysql_syncer_spark.operators.privacy import (
            t_closeness_cells,
            t_closeness_ordered_cells,
        )

        df = spark.createDataFrame(
            [("g1", 7), ("g2", 7)], "g STRING, s LONG"
        )
        for fn in (t_closeness_cells, t_closeness_ordered_cells):
            out = fn(df, ["g"], "s", 0.1).collect()
            assert all(r["emd"] == 0.0 and not r["risky"] for r in out)

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.privacy import t_closeness_cells

        df = spark.createDataFrame(self.TROWS, "g STRING, s STRING")
        with pytest.raises(ValueError, match="t must be"):
            t_closeness_cells(df, ["g"], "s", 1.5)
        with pytest.raises(ValueError, match="non-empty"):
            t_closeness_cells(df, [], "s", 0.2)
        with pytest.raises(ValueError, match="quasi column"):
            t_closeness_cells(df, ["s"], "s", 0.2)


class TestTClosenessReports:
    """The one-row release gates completing the triad (k-anonymity,
    l-diversity, t-closeness each expose cells + report)."""

    def test_categorical_report(self, spark):
        from mysql_syncer_spark.operators.privacy import (
            t_closeness_cells,
            t_closeness_report,
        )

        df = spark.createDataFrame(
            TestTCloseness.TROWS, "g STRING, s STRING"
        )
        rep = t_closeness_report(df, ["g"], "s", t=0.2).first()
        cells = t_closeness_cells(df, ["g"], "s", t=0.2).collect()
        assert rep["n_cells"] == len(cells)
        assert rep["n_risky_cells"] == sum(1 for c in cells if c["risky"])
        assert rep["rows_at_risk"] == sum(
            c["n_rows"] for c in cells if c["risky"])
        assert rep["max_emd"] == max(c["emd"] for c in cells)
        assert rep["t_close"] == (rep["n_risky_cells"] == 0)

    def test_ordered_report_gate_flips_with_t(self, spark):
        from mysql_syncer_spark.operators.privacy import (
            t_closeness_ordered_report,
        )

        rows = [("x", 1), ("x", 3), ("y", 1), ("y", 2), ("z", 2),
                ("z", 3)]
        df = spark.createDataFrame(rows, "g STRING, s LONG")
        tight = t_closeness_ordered_report(df, ["g"], "s", 0.01).first()
        loose = t_closeness_ordered_report(df, ["g"], "s", 0.9).first()
        assert not tight["t_close"] and tight["n_risky_cells"] > 0
        assert loose["t_close"] and loose["n_risky_cells"] == 0


class TestDpGroupCounts:
    """E176 Laplace-mechanism count release (operators/privacy.py)."""

    def _df(self, spark, n_groups=200, per=50):
        rows = [(f"g{i:03d}", j) for i in range(n_groups)
                for j in range(per)]
        return spark.createDataFrame(rows, "g string, x long")

    def test_noise_scale_tracks_epsilon(self, spark):
        from mysql_syncer_spark.operators.privacy import dp_group_counts

        df = self._df(spark)
        for eps, lo, hi in ((1.0, 0.4, 2.5), (0.1, 4.0, 25.0)):
            out = dp_group_counts(df, ["g"], epsilon=eps).collect()
            errs = [abs(r.dp_count - 50) for r in out]
            mean_err = sum(errs) / len(errs)
            # Laplace(1/eps): E|noise| = 1/eps (rounding shaves a bit)
            assert lo <= mean_err <= hi, (eps, mean_err)

    def test_clamped_at_zero_and_integer(self, spark):
        from mysql_syncer_spark.operators.privacy import dp_group_counts

        df = spark.createDataFrame(
            [(f"g{i}", 1) for i in range(50)], "g string, x long"
        )  # true count 1 per group; eps tiny -> noise >> 1
        out = dp_group_counts(df, ["g"], epsilon=0.01).collect()
        assert all(r.dp_count >= 0 for r in out)
        assert all(isinstance(r.dp_count, int) for r in out)
        assert any(r.dp_count == 0 for r in out)  # clamp engaged

    def test_deterministic_per_seed(self, spark):
        from mysql_syncer_spark.operators.privacy import dp_group_counts

        df = self._df(spark, n_groups=20)
        a = sorted(map(tuple, dp_group_counts(
            df, ["g"], 0.5, seed="release1").collect()))
        b = sorted(map(tuple, dp_group_counts(
            df, ["g"], 0.5, seed="release1").collect()))
        c = sorted(map(tuple, dp_group_counts(
            df, ["g"], 0.5, seed="release2").collect()))
        assert a == b
        assert a != c  # a fresh seed redraws the noise
        # seed=None (the default) draws fresh entropy per release:
        # two default calls must NOT reproduce each other
        d = sorted(map(tuple, dp_group_counts(df, ["g"], 0.5).collect()))
        e = sorted(map(tuple, dp_group_counts(df, ["g"], 0.5).collect()))
        assert d != e

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.privacy import dp_group_counts

        df = self._df(spark, n_groups=2)
        with pytest.raises(ValueError, match="epsilon"):
            dp_group_counts(df, ["g"], epsilon=0)
