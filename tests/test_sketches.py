"""Approximate aggregates (sketches): the at-scale swap-ins for exact
distinct counts and quantiles. Engine-specific estimates can't hash-match
a DuckDB oracle, so the gate is tolerance against the exact computation
— the same contract a user accepts when choosing the sketch."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from mysql_syncer_spark.sources.catalog import load_table

    return load_table(spark, sf_dir, "events")


def test_approx_count_distinct_within_rsd(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.08 * n), (k, n, approx[k])


def test_approx_percentile_close_to_exact(events):
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("approx_p99"),
    ).first()
    spread = events.agg(
        (F.max("value") - F.min("value")).alias("r")
    ).first()["r"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.05 * spread
    assert abs(row["approx_p99"] - row["exact_p99"]) <= 0.05 * spread


def test_hll_rollup_estimates_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        hll_estimate_over,
        hll_rollup,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    grain = events.withColumn("day", F.to_date("ts"))
    rollup = hll_rollup(grain, ["day", "event_type"], "user_id")
    # estimate per event_type from the daily grain vs exact
    est = {
        r["event_type"]: r["n_distinct_est"]
        for r in hll_estimate_over(rollup, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in grain.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)
    # grand total across all grains
    total = hll_estimate_over(rollup, []).first()["n_distinct_est"]
    exact_total = grain.select("user_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05


def test_hll_merge_equals_direct_union(spark, sf_dir):
    """The maintenance property: folding batch state into stored state
    must estimate EXACTLY what a direct one-shot rollup over all the data
    estimates — merge loses nothing."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        hll_estimate_over,
        hll_rollup,
        hll_rollup_merge,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    old = events.where(F.col("event_id") % 3 != 0)
    new = events.where(F.col("event_id") % 3 == 0)
    grain = ["day", "event_type"]
    merged = hll_rollup_merge(
        hll_rollup(old, grain, "user_id"),
        hll_rollup(new, grain, "user_id"),
        grain,
    )
    direct = hll_rollup(events, grain, "user_id")
    a = {
        tuple(r[g] for g in ["event_type"]) + (r["n_distinct_est"],)
        for r in hll_estimate_over(merged, ["event_type"]).collect()
    }
    b = {
        tuple(r[g] for g in ["event_type"]) + (r["n_distinct_est"],)
        for r in hll_estimate_over(direct, ["event_type"]).collect()
    }
    assert a == b


class TestCountMinSketch:
    PARAMS = dict(depth=4, width=256)

    def _items(self, spark, data):
        return spark.createDataFrame([(x,) for x in data], "item string")

    def test_never_underestimates_and_small_width_overestimates(self, spark):
        from mysql_syncer_spark.operators.sketches import (
            cms_build, cms_estimate,
        )

        data = (["a"] * 50) + (["b"] * 20) + [f"x{i}" for i in range(300)]
        df = self._items(spark, data)
        sketch = cms_build(df, "item", **self.PARAMS)
        probes = self._items(spark, ["a", "b", "x0", "absent"])
        got = {
            r.item: r.cms_count
            for r in cms_estimate(sketch, probes, "item", **self.PARAMS)
            .collect()
        }
        # the count-min guarantee: estimate >= truth, always
        assert got["a"] >= 50 and got["b"] >= 20 and got["x0"] >= 1
        assert got["absent"] >= 0
        # and the sketch is genuinely bounded
        assert sketch.count() <= 4 * 256

    def test_exact_when_no_collisions(self, spark):
        from mysql_syncer_spark.operators.sketches import (
            cms_build, cms_estimate,
        )

        data = (["a"] * 7) + (["b"] * 3)  # 2 items in 4x2048 cells
        sketch = cms_build(self._items(spark, data), "item")
        got = {
            r.item: r.cms_count
            for r in cms_estimate(
                sketch, self._items(spark, ["a", "b"]), "item"
            ).collect()
        }
        assert got == {"a": 7, "b": 3}

    def test_merge_equals_rebuild(self, spark):
        from mysql_syncer_spark.operators.sketches import (
            cms_build, cms_estimate, cms_merge,
        )

        day1 = (["a"] * 5) + ["b"]
        day2 = (["a"] * 2) + (["c"] * 9)
        s1 = cms_build(self._items(spark, day1), "item", **self.PARAMS)
        s2 = cms_build(self._items(spark, day2), "item", **self.PARAMS)
        merged = cms_merge(s1, s2)
        rebuilt = cms_build(
            self._items(spark, day1 + day2), "item", **self.PARAMS
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_weighted_build(self, spark):
        from mysql_syncer_spark.operators.sketches import (
            cms_build, cms_estimate,
        )

        tf = spark.createDataFrame(
            [("a", 11), ("b", 4)], "item string, tf long"
        )
        sketch = cms_build(tf, "item", weight_col="tf")
        got = {
            r.item: r.cms_count
            for r in cms_estimate(
                sketch, self._items(spark, ["a", "b"]), "item"
            ).collect()
        }
        assert got == {"a": 11, "b": 4}

    def test_null_items_skipped_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sketches import cms_build

        df = self._items(spark, ["a"]).unionByName(
            self._items(spark, ["a"]).selectExpr("CAST(NULL AS STRING) item")
        )
        total = (
            cms_build(df, "item", **self.PARAMS)
            .groupBy()
            .sum("cnt")
            .collect()[0][0]
        )
        assert total == 1 * 4  # one non-null item, depth rows
        with _pytest.raises(ValueError):
            cms_build(df, "item", depth=0)

    def test_sketch_broadcast_onto_probes(self, spark, sf_dir):
        """The ≤ depth×width sketch must broadcast; shuffling the probe
        side on (row, bucket) is the plan this operator exists to
        avoid."""
        from mysql_syncer_spark import queries as registry

        df = registry.queries()["cms_term_counts_docs"](spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan


def test_hll_intersection_estimate_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        hll_intersection_estimate,
        hll_rollup,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = [
        r["event_type"]
        for r in events.select("event_type").distinct().limit(2).collect()
    ]
    a, b = sorted(types)
    rollup = hll_rollup(events, ["event_type"], "user_id")
    row = hll_intersection_estimate(rollup, "event_type", a, b).first()
    users = lambda p: {  # noqa: E731
        r["user_id"] for r in events.where(p).select("user_id").distinct().collect()
    }
    ua, ub = users(F.col("event_type") == a), users(F.col("event_type") == b)
    exact = len(ua & ub)
    # the fixture's type populations overlap heavily, so the
    # inclusion-exclusion regime is the favorable one the docstring
    # scopes this estimator to; lgK=12 keeps each term within ~2%
    assert abs(row["n_union"] - len(ua | ub)) <= max(3, 0.08 * len(ua | ub))
    assert abs(row["n_intersection"] - exact) <= max(5, 0.15 * exact)


class TestQuantileSketch:
    """Mergeable quantile summaries (E134): exactness law, approx-mode
    rank-error invariants, mass conservation, actual-data-value
    answers, NULL exclusion, validation."""

    @staticmethod
    def _disc(vals, p):
        import math

        return sorted(vals)[math.ceil(p * len(vals)) - 1]

    def test_exactness_law_matches_rank_rule(self, spark):
        from mysql_syncer_spark.operators.sketches import quantile_sketch

        vals = [float(i % 13) for i in range(1000)]
        df = spark.createDataFrame(
            [(v,) for v in vals], "v double"
        ).repartition(4, "v")
        out = quantile_sketch(df, "v", 64, [0.25, 0.5, 0.9, 1.0]).collect()
        assert all(r["err_bound"] == 0 for r in out)
        for r in out:
            assert r["value"] == self._disc(vals, r["p"])

    def test_approx_mode_invariants(self, spark):
        """capacity << distinct: every answer is an actual data value
        whose true rank is within err_bound of ceil(p*N); total kept
        mass is the exact row count; merged summary is capacity+1
        bounded."""
        import bisect
        import math

        from pyspark.sql import functions as F

        from mysql_syncer_spark.operators.sketches import (
            quantile_merge,
            quantile_query,
            quantile_summaries,
        )

        vals = [float((i * 7919) % 100003) for i in range(20000)]
        df = spark.createDataFrame(
            [(v,) for v in vals], "v double"
        ).repartition(4, "v")
        merged = quantile_merge(quantile_summaries(df, "v", 64), 64)
        rows = merged.collect()
        assert len(rows) <= 65
        assert sum(r["weight"] for r in rows) == len(vals)
        svals = sorted(vals)
        out = quantile_query(merged, [0.1, 0.5, 0.9, 1.0]).collect()
        for r in out:
            assert r["value"] in set(vals)  # never interpolated
            target = math.ceil(r["p"] * len(svals))
            lo = bisect.bisect_left(svals, r["value"]) + 1
            hi = bisect.bisect_right(svals, r["value"])
            dist = (
                0
                if lo <= target <= hi
                else min(abs(lo - target), abs(hi - target))
            )
            assert dist <= r["err_bound"], (r["p"], dist, r["err_bound"])
        # p=1.0 always answers the true max (tail mass never dropped)
        assert out[-1]["value"] == max(vals)

    def test_merge_exact_when_capacity_covers_distinct(self, spark):
        """No compression anywhere -> the merged summary IS the exact
        value histogram (groupBy count equality), err_bound == 0."""
        from pyspark.sql import functions as F

        from mysql_syncer_spark.operators.sketches import (
            quantile_merge,
            quantile_summaries,
        )

        vals = [float(i % 7) for i in range(500)]
        df = spark.createDataFrame(
            [(v,) for v in vals], "v double"
        ).repartition(3, "v")
        merged = quantile_merge(quantile_summaries(df, "v", 16), 16)
        got = {
            r["value"]: r["weight"] for r in merged.collect()
        }
        exact = {
            r["v"]: r["n"]
            for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
        }
        assert got == exact
        assert merged.agg(F.max("err_bound")).first()[0] == 0

    def test_null_exclusion_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sketches import (
            quantile_merge,
            quantile_query,
            quantile_sketch,
            quantile_summaries,
        )

        df = spark.createDataFrame(
            [(1.0,), (None,), (3.0,), (None,)], "v double"
        )
        merged = quantile_merge(quantile_summaries(df, "v", 8), 8)
        assert sum(r["weight"] for r in merged.collect()) == 2
        out = quantile_query(merged, [0.5, 1.0]).collect()
        assert [r["value"] for r in out] == [1.0, 3.0]
        with _pytest.raises(ValueError, match="capacity"):
            quantile_summaries(df, "v", 1)
        with _pytest.raises(ValueError, match="capacity"):
            quantile_merge(merged, 1)
        with _pytest.raises(ValueError, match="non-empty"):
            quantile_query(merged, [])
        with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
            quantile_query(merged, [0.0])


class TestBitmapRollup:
    """Exact bitmap distinct-count rollups (E140): exactness vs
    COUNT(DISTINCT) at every regrouping, the lossless merge law
    (rollup(a ∪ b) == merge(rollup(a), rollup(b))), cross-bucket keys,
    NULL exclusion, validation."""

    def test_regroupings_are_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from mysql_syncer_spark.operators.sketches import (
            bitmap_distinct_over,
            bitmap_rollup,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.date_trunc("day", "ts")
        )
        rollup = bitmap_rollup(ev, ["event_type", "day"], "user_id")
        for grouping in (["event_type"], ["day"], ["event_type", "day"]):
            got = {
                tuple(r[c] for c in grouping): r["n_distinct"]
                for r in bitmap_distinct_over(rollup, grouping).collect()
            }
            exact = {
                tuple(r[c] for c in grouping): r["n"]
                for r in ev.groupBy(*grouping)
                .agg(F.count_distinct("user_id").alias("n"))
                .collect()
            }
            assert got == exact, grouping

    def test_merge_is_lossless(self, spark):
        from pyspark.sql import functions as F

        from mysql_syncer_spark.operators.sketches import (
            bitmap_distinct_over,
            bitmap_rollup,
            bitmap_rollup_merge,
        )

        # keys straddle bucket boundaries (bucket = 32768 ids) and
        # overlap across batches
        a = spark.createDataFrame(
            [("g", i) for i in [1, 2, 70000]], "g string, k long"
        )
        b = spark.createDataFrame(
            [("g", i) for i in [2, 70000, 70001, 200000]],
            "g string, k long",
        )
        merged = bitmap_rollup_merge(
            bitmap_rollup(a, ["g"], "k"),
            bitmap_rollup(b, ["g"], "k"),
            ["g"],
        )
        direct = bitmap_rollup(a.unionByName(b), ["g"], "k")
        got = bitmap_distinct_over(merged, ["g"]).first()["n_distinct"]
        want = bitmap_distinct_over(direct, ["g"]).first()["n_distinct"]
        assert got == want == 5

    def test_null_exclusion_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sketches import (
            bitmap_distinct_over,
            bitmap_rollup,
        )

        df = spark.createDataFrame(
            [("g", 1), ("g", None), ("g", 1)], "g string, k long"
        )
        rollup = bitmap_rollup(df, ["g"], "k")
        assert bitmap_distinct_over(rollup, ["g"]).first()["n_distinct"] == 1
        with _pytest.raises(ValueError, match="grain_cols"):
            bitmap_rollup(df, [], "k")
        with _pytest.raises(ValueError, match="group_cols"):
            bitmap_distinct_over(rollup, [])


def test_quantile_bigint_values_above_2_53_stay_exact(spark):
    """Regression twin of the Misra-Gries sentinel fix: bigint VALUES
    above 2^53 must survive the per-partition fold bit-exact (the old
    None-appended sentinel coerced the pandas column to float64)."""
    from mysql_syncer_spark.operators.sketches import (
        quantile_merge,
        quantile_summaries,
    )

    v1, v2 = (1 << 60) + 1, (1 << 60) + 5
    df = spark.createDataFrame(
        [(v1,)] * 30 + [(v2,)] * 10, "v bigint"
    ).coalesce(1)
    merged = quantile_merge(quantile_summaries(df, "v", 64), 64).collect()
    assert {r["value"]: r["weight"] for r in merged} == {v1: 30, v2: 10}


class TestBitmapOverlap:
    """Exact inclusion-exclusion over the bitmap state: |A∩B| =
    |A| + |B| − |A∪B|, verified against a hand-computed set overlap,
    including a group where one segment is absent."""

    def test_overlap_matches_sets(self, spark):
        from mysql_syncer_spark.operators.sketches import (
            bitmap_overlap,
            bitmap_rollup,
        )

        rows = [
            # day 1: A users {1,2,3}, B users {2,3,4} -> inter {2,3}
            (1, "A", 1), (1, "A", 2), (1, "A", 3),
            (1, "B", 2), (1, "B", 3), (1, "B", 4),
            # day 2: A users {7}, B absent
            (2, "A", 7),
            # noise segment never queried
            (1, "C", 99),
        ]
        df = spark.createDataFrame(rows, "day long, seg string, uid long")
        roll = bitmap_rollup(df, ["day", "seg"], "uid")
        out = {r["day"]: r for r in bitmap_overlap(
            roll, ["day"], "seg", "A", "B").collect()}
        assert (out[1]["n_a"], out[1]["n_b"], out[1]["n_union"],
                out[1]["n_overlap"]) == (3, 3, 4, 2)
        assert abs(out[1]["jaccard"] - 0.5) < 1e-12
        assert (out[2]["n_a"], out[2]["n_b"], out[2]["n_overlap"]) \
            == (1, 0, 0)

    def test_overlap_from_merged_state(self, spark):
        """The overlap reads the same off MERGED incremental state —
        the OR-merge losslessness carries through the identity."""
        from mysql_syncer_spark.operators.sketches import (
            bitmap_overlap,
            bitmap_rollup,
            bitmap_rollup_merge,
        )

        d1 = spark.createDataFrame(
            [(1, "A", 1), (1, "B", 2)], "day long, seg string, uid long"
        )
        d2 = spark.createDataFrame(
            [(1, "A", 2), (1, "B", 1)], "day long, seg string, uid long"
        )
        merged = bitmap_rollup_merge(
            bitmap_rollup(d1, ["day", "seg"], "uid"),
            bitmap_rollup(d2, ["day", "seg"], "uid"),
            ["day", "seg"],
        )
        r = bitmap_overlap(merged, ["day"], "seg", "A", "B").first()
        # A = {1,2}, B = {1,2} after the merge -> full overlap
        assert (r["n_a"], r["n_b"], r["n_overlap"]) == (2, 2, 2)
        assert abs(r["jaccard"] - 1.0) < 1e-12


def test_bitmap_overlap_empty_union_yields_zero_jaccard(spark):
    """Round-9 ADVICE: a group whose bitmaps are all empty (n_union =
    0) must yield jaccard 0.0, not NULL (or an ANSI divide error)."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sketches import (
        bitmap_overlap,
        bitmap_rollup,
    )

    df = spark.createDataFrame(
        [(1, "A", 1), (1, "B", 2)], "day long, seg string, uid long"
    )
    roll = bitmap_rollup(df, ["day", "seg"], "uid").withColumn(
        "__bitmap", F.lit(bytearray(4096))
    )
    r = bitmap_overlap(roll, ["day"], "seg", "A", "B").first()
    assert (r["n_a"], r["n_b"], r["n_union"], r["n_overlap"]) == (0, 0, 0, 0)
    assert r["jaccard"] == 0.0
