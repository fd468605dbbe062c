"""Single-pass table profiling: exact stats, NULL handling, type
stringification, one-scan plan."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.profile import profile_table
from mysql_syncer_spark.sources.bucketed import physical_plan


def test_profile_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, None),
            (2, "b", 2.25, 7),
            (3, None, None, 7),
            (4, "a", -0.125, 9),
        ],
        "id long, s string, d double, i long",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "d", "i"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_nulls"], got["id"]["n_distinct"]) == (0, 4)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["i"]["n_nulls"], got["i"]["n_distinct"]) == (1, 2)
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "4")
    # doubles render at fixed 6-dp scale (deterministic cross-engine)
    assert got["d"]["min_value"] == "-0.125000"
    assert got["d"]["max_value"] == "2.250000"


def test_profile_skips_complex_columns(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], b"xx")], "id long, emb array<double>, blob binary"
    )
    cols = [r["column"] for r in profile_table(df).collect()]
    assert cols == ["id"]


def test_profile_unknown_column_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_profile_plan_all_hash_aggregates(spark, sf_dir):
    """The profile must stay in hash aggregates over narrow rows: no
    Expand (Spark's multi-distinct rewrite) and no SortAggregate
    (benched ~10x the all-hash shape), at most two scans (stats +
    distinct-pairs)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = physical_plan(profile_table(orders))
    assert "Expand" not in plan, plan
    # no Sort NODES anywhere: the keyless stats fold may print as
    # SortAggregate (string min/max buffers aren't hash-able) but with
    # zero grouping keys it sorts nothing — the expensive thing the old
    # multi-distinct shape did was Sort C x rows of wide tuples
    assert "+- Sort " not in plan and ": Sort " not in plan, plan
    # formatted plans print each node twice (tree line + detail block);
    # count scans by their one-per-scan Location detail
    assert plan.count("Location: InMemoryFileIndex") <= 2, plan


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "id long, s string")
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["id"]["n_rows"] == 0 and got["id"]["n_distinct"] == 0
    assert got["s"]["min_value"] is None


def test_group_quantiles(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)]
        + [("b", 5.0), ("b", None), ("c", None)],
        "g STRING, v DOUBLE",
    )
    out = {
        (r["g"], r["prob"]): r["quantile"]
        for r in group_quantiles(df, ["g"], "v", probs=(0.5, 0.9)).collect()
    }
    assert out[("a", 0.5)] == 50.5   # interpolated median of 1..100
    assert out[("a", 0.9)] == 90.1
    assert out[("b", 0.5)] == 5.0    # NULLs ignored
    assert out[("c", 0.5)] is None   # all-NULL group survives with NULL

    # approx form: same grain, estimates within tolerance
    ap = {
        (r["g"], r["prob"]): r["quantile"]
        for r in group_quantiles(
            df, ["g"], "v", probs=(0.5, 0.9), approx=True
        ).collect()
    }
    assert abs(ap[("a", 0.5)] - 50.5) <= 1.0
    assert ap[("b", 0.5)] == 5.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="probs"):
        group_quantiles(df, ["g"], "v", probs=())


class TestIntegrity:
    def test_fk_orphans_and_null_semantics(self, spark):
        from mysql_syncer_spark.operators.profile import fk_orphans

        parent = spark.createDataFrame([(1,), (2,)], "pid long")
        child = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3), (13, None)],
            "cid long, fk long",
        )
        got = sorted(
            r.cid for r in fk_orphans(
                child, parent, ["fk"], ["pid"]).collect()
        )
        assert got == [12]  # NULL fk is NOT an orphan

    def test_composite_key_orphans(self, spark):
        from mysql_syncer_spark.operators.profile import fk_orphans

        parent = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        child = spark.createDataFrame(
            [(10, 1, "a"), (11, 1, "b"), (12, 2, "b")],
            "cid long, fk long, fs string",
        )
        got = sorted(
            r.cid for r in fk_orphans(
                child, parent, ["fk", "fs"], ["k", "s"]).collect()
        )
        assert got == [11]  # (1,'b') exists in neither parent row

    def test_duplicate_pks(self, spark):
        from mysql_syncer_spark.operators.profile import duplicate_pks

        df = spark.createDataFrame(
            [(1,), (2,), (2,), (3,), (3,), (3,)], "pk long"
        )
        got = {r.pk: r.n_rows for r in duplicate_pks(df, ["pk"]).collect()}
        assert got == {2: 2, 3: 3}

    def test_integrity_report_shape_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.profile import (
            duplicate_pks, fk_orphans, integrity_report,
        )

        parent = spark.createDataFrame([(1,)], "pid long")
        child = spark.createDataFrame([(10, 9)], "cid long, fk long")
        rep = {
            r.constraint: r.violations
            for r in integrity_report(
                [
                    ("fk", fk_orphans(child, parent, ["fk"], ["pid"])),
                    ("pk", duplicate_pks(parent, ["pid"])),
                ]
            ).collect()
        }
        assert rep == {"fk": 1, "pk": 0}
        with _pytest.raises(ValueError):
            integrity_report([])
        with _pytest.raises(ValueError):
            fk_orphans(child, parent, [], [])
        with _pytest.raises(ValueError):
            fk_orphans(child, parent, ["fk"], ["pid", "x"])


class TestProfileDrift:
    def test_detects_null_and_distinct_drift(self, spark):
        from mysql_syncer_spark.operators.profile import profile_drift

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, v string"
        )
        new = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None), (4, "a")], "id long, v string"
        )
        got = {r["column"]: r for r in profile_drift(old, new).collect()}
        v = got["v"]
        assert (v.n_nulls_a, v.n_nulls_b) == (0, 2)
        assert (v.n_distinct_a, v.n_distinct_b) == (4, 1)
        assert abs(v.null_rate_delta - 0.5) < 1e-9
        assert got["id"].null_rate_delta == 0.0

    def test_row_count_drift(self, spark):
        from mysql_syncer_spark.operators.profile import profile_drift

        old = spark.createDataFrame([(i,) for i in range(10)], "id long")
        new = spark.createDataFrame([(i,) for i in range(7)], "id long")
        r = profile_drift(old, new).collect()[0]
        assert (r.n_rows_a, r.n_rows_b) == (10, 7)


class TestFDAudit:
    """Functional-dependency audit (E142): hand-built holds/violations,
    NULL semantics (NULL dependent contradicts nothing; NULL
    determinant is a key like any other), validation."""

    def test_holds_and_violations(self, spark):
        from mysql_syncer_spark.operators.profile import fd_audit

        df = spark.createDataFrame(
            [("94110", "SF", "CA"), ("94110", "SF", "CA"),
             ("10115", "Berlin", "BE"), ("10115", "Bärlin", "BE")],
            "zip string, city string, state string",
        )
        got = {
            (r["determinant"], r["dependent"]): (
                r["n_keys"], r["n_violating_keys"], r["holds"]
            )
            for r in fd_audit(
                df, [("zip", "state"), ("zip", "city"), ("state", "zip")]
            ).collect()
        }
        assert got[("zip", "state")] == (2, 0, True)
        assert got[("zip", "city")] == (2, 1, False)  # Berlin typo
        assert got[("state", "zip")] == (2, 0, True)

    def test_null_semantics(self, spark):
        from mysql_syncer_spark.operators.profile import fd_audit

        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("b", None), (None, "y"), (None, "y")],
            "k string, v string",
        )
        r = fd_audit(df, [("k", "v")]).first()
        # NULL dependent contradicts nothing: 'a' maps to {x}, holds;
        # 'b' maps to {}, holds; NULL determinant is its own key
        assert (r["n_keys"], r["n_violating_keys"], r["holds"]) == (3, 0, True)

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.profile import fd_audit

        df = spark.createDataFrame([("a", "b")], "k string, v string")
        with _pytest.raises(ValueError, match="non-empty"):
            fd_audit(df, [])
        with _pytest.raises(ValueError, match="determinant == dependent"):
            fd_audit(df, [("k", "k")])


class TestBenfordScreen:
    """Benford first-digit screen (E143): digit extraction edges,
    a Benford-conforming sample passes while a uniform-digit sample
    fails, zero/NULL exclusion, min_rows power guard, validation."""

    def test_digit_extraction_edges(self, spark):
        from mysql_syncer_spark.operators.profile import benford_screen

        # negatives and sub-1 magnitudes: |-0.042| -> 4; 0.9 -> 9;
        # 1234 -> 1 — build a group where digit identity decides chi2
        import math

        from mysql_syncer_spark.operators.profile import BENFORD_P

        rows = [("g", v) for v in (-0.042, 0.9, 1234.0)] * 40
        df = spark.createDataFrame(rows, "g string, v double")
        r = benford_screen(df, ["g"], "v", min_rows=100).first()
        assert r["n_rows"] == 120
        # digits 1/4/9 each observed 40x; chi2 computable by hand
        n = 120
        chi = sum(
            (obs - p * n) ** 2 / (p * n)
            for d, p in BENFORD_P.items()
            for obs in [40 if d in (1, 4, 9) else 0]
        )
        assert abs(r["chi2"] - chi) < 1e-4

    def test_benford_sample_passes_uniform_fails(self, spark):
        import math

        from mysql_syncer_spark.operators.profile import benford_screen

        # Benford-conforming: n=1000 values whose first digits follow
        # P(d) exactly (to rounding); uniform: 9 digits equally often
        from mysql_syncer_spark.operators.profile import BENFORD_P

        benford_rows = []
        for d, p in BENFORD_P.items():
            benford_rows += [("ok", float(d))] * round(p * 1000)
        uniform_rows = [("bad", float(d)) for d in range(1, 10)] * 112
        df = spark.createDataFrame(
            benford_rows + uniform_rows, "g string, v double"
        )
        got = {
            r["g"]: r["suspicious"]
            for r in benford_screen(df, ["g"], "v", min_rows=100).collect()
        }
        assert got == {"ok": False, "bad": True}

    def test_exclusions_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.profile import benford_screen

        df = spark.createDataFrame(
            [("g", 0.0), ("g", None), ("g", 1.0)], "g string, v double"
        )
        # zero and NULL excluded -> 1 usable row < min_rows -> no output
        assert benford_screen(df, ["g"], "v", min_rows=100).count() == 0
        r = benford_screen(df, ["g"], "v", min_rows=1).first()
        assert r["n_rows"] == 1
        with _pytest.raises(ValueError, match="min_rows"):
            benford_screen(df, ["g"], "v", min_rows=0)
        with _pytest.raises(ValueError, match="group_cols"):
            benford_screen(df, [], "v")


class TestExactNtile:
    """operators/profile.py exact_ntile — global NTILE without a
    global sort window, equal to the literal NTILE reference."""

    @staticmethod
    def _reference(rows, k):
        import hashlib
        import math

        order = sorted(
            (v, hashlib.md5(str(kk).encode()).hexdigest(), kk)
            for kk, v in rows
        )
        n = len(order)
        q, rem = divmod(n, k)
        out = {}
        for i, (_, _, kk) in enumerate(order, 1):
            if i <= rem * (q + 1):
                out[kk] = math.ceil(i / (q + 1))
            else:
                out[kk] = rem + math.ceil((i - rem * (q + 1)) / max(q, 1))
        return out

    def test_matches_reference_across_regimes(self, spark):
        import random

        from mysql_syncer_spark.operators.profile import exact_ntile

        rng = random.Random(7)
        makers = [
            lambda: rng.uniform(0, 100),  # distinct-ish
            lambda: float(rng.randint(0, 5)),  # heavy ties
            lambda: 42.0,  # single value
            lambda: rng.choice([1e-9 * rng.random(), 1e9]),  # range skew
        ]
        for maker in makers:
            rows = [(i, maker()) for i in range(400)]
            rows += [(900 + j, None) for j in range(4)]  # NULLs excluded
            df = spark.createDataFrame(rows, "k long, v double")
            for k in (1, 4, 7):
                got = {
                    r.k: r.bin
                    for r in exact_ntile(df, "v", "k", k).collect()
                }
                exp = self._reference(
                    [(kk, v) for kk, v in rows if v is not None], k
                )
                assert got == exp

    def test_bin_sizes_follow_ntile_convention(self, spark):
        from mysql_syncer_spark.operators.profile import exact_ntile

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k long, v double"
        )
        from collections import Counter

        sizes = Counter(
            r.bin for r in exact_ntile(df, "v", "k", 3).collect()
        )
        assert sizes == {1: 4, 2: 3, 3: 3}  # 10 = 4+3+3

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.profile import exact_ntile

        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        with _pytest.raises(ValueError):
            exact_ntile(df, "v", "k", 0)
        with _pytest.raises(ValueError):
            exact_ntile(df, "v", "k", 3, range_buckets=0)

    def test_grouped_matches_partitioned_reference(self, spark):
        import random

        from mysql_syncer_spark.operators.profile import exact_ntile

        rng = random.Random(3)
        rows, i = [], 0
        for g, n, maker in (
            ("a", 200, lambda: rng.uniform(0, 10)),  # distinct-ish
            ("b", 50, lambda: float(rng.randint(0, 3))),  # ties
            ("c", 7, lambda: 5.0),  # single value, N < k
        ):
            for _ in range(n):
                rows.append((i, g, maker()))
                i += 1
        rows.append((9999, "a", None))
        df = spark.createDataFrame(rows, "k long, g string, v double")
        for k in (1, 4):
            got = {
                r.k: r.bin
                for r in exact_ntile(
                    df, "v", "k", k, group_cols=["g"]
                ).collect()
            }
            from collections import defaultdict

            by_g = defaultdict(list)
            for kk, g, v in rows:
                if v is not None:
                    by_g[g].append((kk, v))
            exp = {}
            for g, items in by_g.items():
                exp.update(
                    self._reference(items, k)
                )
            assert got == exp, k


class TestExactNtileNullGroups:
    """NULL group keys form their own NTILE partition (ADVICE r9): the
    internal equi-joins go through a struct-wrapped group key, matching
    the oracle's NTILE(...) PARTITION BY keeping a NULL partition."""

    def test_null_group_binned_not_dropped(self, spark):
        from mysql_syncer_spark.operators.profile import exact_ntile

        rows = [(i, "a", float(i)) for i in range(10)]
        rows += [(100 + i, None, float(i)) for i in range(6)]
        df = spark.createDataFrame(rows, "k long, g string, v double")
        out = exact_ntile(df, "v", "k", 3, group_cols=["g"]).collect()
        assert len(out) == 16  # every row kept, incl. the NULL group
        null_bins = sorted(r.bin for r in out if r.g is None)
        # 6 rows into 3 bins: 2/2/2, values ordered -> exact NTILE
        assert null_bins == [1, 1, 2, 2, 3, 3]
        by_k = {r.k: r.bin for r in out if r.g is None}
        assert by_k[100] == 1 and by_k[105] == 3

    def test_matches_spark_ntile_with_null_partition(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from mysql_syncer_spark.operators.profile import exact_ntile

        import random

        rng = random.Random(7)
        rows = [
            (i, rng.choice(["x", "y", None]), float(rng.randint(0, 5)))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "k long, g string, v double")
        got = {
            r.k: r.bin
            for r in exact_ntile(df, "v", "k", 4, group_cols=["g"]).collect()
        }
        # reference: Spark's own NTILE with the same total order
        w = Window.partitionBy("g").orderBy(
            "v", F.md5(F.col("k").cast("string")), "k"
        )
        exp = {
            r.k: r.bin
            for r in df.withColumn("bin", F.ntile(4).over(w)).collect()
        }
        assert got == exp
