"""Deterministic hash sampling / splitting."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_deterministic_and_order_independent(docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    s2 = {
        r["doc_id"]
        for r in hash_sample(
            docs.orderBy(F.rand(seed=7)).repartition(7), "doc_id", 0.2
        ).collect()
    }
    assert s1 == s2 and len(s1) > 0


def test_samples_nest(docs):
    """A key in the 5% sample must be in the 20% sample (consistent
    thresholding — lets you grow a sample without resampling)."""
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.05).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    assert small <= big


def test_salt_decorrelates(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, salt="b").collect()}
    assert a != b  # astronomically unlikely to coincide if independent


def test_split_partitions_everything_once(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    # rough proportions (hash uniformity): train within [60%, 95%]
    frac = counts["train"] / docs.count()
    assert 0.6 < frac < 0.95


def test_split_same_key_same_split(spark):
    """Duplicate keys land in one split — the leakage-safety property."""
    df = spark.createDataFrame(
        [(k, i) for k in range(50) for i in range(3)], "key long, seq int"
    )
    out = hash_split(df, "key", {"train": 0.5, "test": 0.5})
    n_violations = (
        out.groupBy("key")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert n_violations == 0


def test_bad_args_raise(docs):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_bucket_range(docs):
    out = docs.select(hash_bucket("doc_id").alias("b"))
    assert out.where((F.col("b") < 0) | (F.col("b") >= BUCKETS)).count() == 0


def test_quota_sample_caps_groups(spark):
    from mysql_syncer_spark.operators.sampling import quota_sample
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = quota_sample(df, "g", 5, "k")
    sizes = {r["g"]: r["n"] for r in
             out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 5, "small": 5}
    # deterministic under reshuffle
    again = quota_sample(df.repartition(7), "g", 5, "k")
    assert out.exceptAll(again).count() == 0
    # a group under quota passes through whole
    tiny = quota_sample(df.where("k >= 95"), "g", 99, "k")
    assert tiny.count() == 5
    import pytest as _pt
    with _pt.raises(ValueError):
        quota_sample(df, "g", 0, "k")


def test_priority_sample_size_and_determinism(docs):
    from mysql_syncer_spark.operators.sampling import priority_sample

    w = F.col("n_chars") + F.lit(1)
    s1 = priority_sample(docs, "doc_id", w, 20)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert len(ids1) == 20
    # stable under repartitioning (priorities are row-local)
    s2 = priority_sample(docs.repartition(7), "doc_id", w, 20)
    assert sorted(r["doc_id"] for r in s2.collect()) == ids1
    # re-salting draws a different sample
    s3 = priority_sample(docs, "doc_id", w, 20, salt="b")
    assert sorted(r["doc_id"] for r in s3.collect()) != ids1


def test_priority_sample_weight_dominance(spark):
    from mysql_syncer_spark.operators.sampling import priority_sample

    # weight >> everyone else's => always sampled; the u denominator is
    # at most 1, so w/u >= w, and the giant's priority beats any small
    # row's w/u upper bound (w_small / u_min = w_small * (BUCKETS+1))
    rows = [(i, 1.0) for i in range(100)] + [(100, 10.0 * (BUCKETS + 1))]
    df = spark.createDataFrame(rows, "id long, w double")
    out = priority_sample(df, "id", "w", 5)
    assert 100 in {r["id"] for r in out.collect()}


def test_priority_sample_bad_args(docs):
    from mysql_syncer_spark.operators.sampling import priority_sample

    with pytest.raises(ValueError):
        priority_sample(docs, "doc_id", "n_chars", 0)


def test_cluster_safe_split_keeps_clusters_together(spark):
    from mysql_syncer_spark.operators.cluster import duplicate_clusters
    from mysql_syncer_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 21)], "doc_id long, text string"
    )
    # two clusters: {1,2,3} (transitive) and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    clusters = duplicate_clusters(pairs)
    out = cluster_safe_split(
        docs, clusters, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(rows) == set(range(1, 21))  # every doc assigned exactly once
    assert len({rows[1], rows[2], rows[3]}) == 1  # cluster stays together
    assert rows[10] == rows[11]
    # unclustered rows match a plain hash_split on their own id
    from mysql_syncer_spark.operators.sampling import hash_split

    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs, "doc_id", {"train": 0.5, "val": 0.25, "test": 0.25}
        ).collect()
    }
    for i in set(range(1, 21)) - {1, 2, 3, 10, 11}:
        assert rows[i] == plain[i]


def test_epoch_shuffle_determinism_and_epoch_sensitivity(spark, sf_dir):
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = epoch_shuffle(docs, "doc_id", epoch=1)
    b = epoch_shuffle(docs.repartition(13), "doc_id", epoch=1)
    rows_a = {(r["doc_id"], r["shard"], r["epoch_pos"]) for r in a.collect()}
    rows_b = {(r["doc_id"], r["shard"], r["epoch_pos"]) for r in b.collect()}
    assert rows_a == rows_b  # partitioning-independent

    # a different epoch re-deals shards AND re-orders
    c = {
        (r["doc_id"], r["shard"], r["epoch_pos"])
        for r in epoch_shuffle(docs, "doc_id", epoch=2).collect()
    }
    assert c != rows_a
    moved = sum(
        1
        for (d1, s1, _), (d2, s2, _) in zip(
            sorted(rows_a), sorted(c)
        )
        if d1 == d2 and s1 != s2
    )
    assert moved > len(rows_a) // 4  # most docs change shard

    # positions are a clean 1..n_shard sequence per shard
    n = docs.count()
    per_shard = (
        a.groupBy("shard")
        .agg(F.count("*").alias("cnt"), F.max("epoch_pos").alias("mx"))
        .collect()
    )
    assert sum(r["cnt"] for r in per_shard) == n
    assert all(r["cnt"] == r["mx"] for r in per_shard)


def test_epoch_shuffle_validation(spark, sf_dir):
    import pytest as _pytest

    from mysql_syncer_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with _pytest.raises(ValueError, match="num_shards"):
        epoch_shuffle(docs, "doc_id", epoch=0, num_shards=0)


class TestStratifiedSample:
    def _docs(self, spark):
        rows = [(i, "en" if i % 4 != 3 else "de") for i in range(400)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_per_stratum_rates(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_sample

        df = self._docs(spark)
        out = stratified_sample(
            df, "lang", {"en": 0.2, "de": 1.0}, "doc_id"
        )
        by = {r["lang"]: r["n"] for r in out.groupBy("lang")
              .agg(F.count("*").alias("n")).collect()}
        n_en = df.where("lang = 'en'").count()
        assert by["de"] == df.where("lang = 'de'").count()  # kept whole
        assert 0.1 * n_en < by.get("en", 0) < 0.35 * n_en   # ~20%

    def test_nested_thresholds(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_sample

        df = self._docs(spark)
        small = {r.doc_id for r in stratified_sample(
            df, "lang", {"en": 0.1, "de": 0.1}, "doc_id").collect()}
        big = {r.doc_id for r in stratified_sample(
            df, "lang", {"en": 0.4, "de": 0.4}, "doc_id").collect()}
        assert small <= big

    def test_default_fraction_drops_unlisted(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_sample

        df = self._docs(spark)
        out = stratified_sample(df, "lang", {"de": 1.0}, "doc_id")
        assert out.where("lang = 'en'").count() == 0

    def test_determinism_under_repartition(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_sample

        df = self._docs(spark)
        a = {r.doc_id for r in stratified_sample(
            df, "lang", {"en": 0.3, "de": 0.7}, "doc_id").collect()}
        b = {r.doc_id for r in stratified_sample(
            df.repartition(7), "lang", {"en": 0.3, "de": 0.7},
            "doc_id").collect()}
        assert a == b

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import stratified_sample

        df = self._docs(spark)
        with _pytest.raises(ValueError):
            stratified_sample(df, "lang", {"en": 1.5}, "doc_id")
        with _pytest.raises(ValueError):
            stratified_sample(df, "lang", {}, "doc_id", default_fraction=-1)

    def test_zero_shuffle_plan(self, spark, sf_dir):
        from mysql_syncer_spark import queries as registry

        df = registry.queries()["stratified_sample_docs"](spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Arguments: hashpartitioning" not in plan, plan
        assert "Join" not in plan, plan


class TestReplicateMixture:
    def _docs(self, spark):
        rows = [(i, "de" if i % 3 == 0 else "web") for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_whole_multiplier_exact(self, spark):
        from mysql_syncer_spark.operators.sampling import replicate_mixture

        df = self._docs(spark)
        out = replicate_mixture(
            df, "lang", {"de": 3.0, "web": 1.0}, "doc_id"
        )
        n_de = df.where("lang = 'de'").count()
        assert out.where("lang = 'de'").count() == 3 * n_de
        assert out.where("lang = 'web'").count() == df.where(
            "lang = 'web'").count()
        # copies are indexed 1..n
        idx = out.where("lang = 'de'").groupBy("doc_id").agg(
            F.sort_array(F.collect_list("copy_idx")).alias("c")).collect()
        assert all(r.c == [1, 2, 3] for r in idx)

    def test_fractional_epoch_rate_and_nesting(self, spark):
        from mysql_syncer_spark.operators.sampling import replicate_mixture

        df = self._docs(spark)
        out = replicate_mixture(df, "lang", {"web": 1.5}, "doc_id")
        n_web = df.where("lang = 'web'").count()
        total = out.count()
        assert n_web * 1.3 < total < n_web * 1.7  # ~1.5 epochs
        # every doc has copy 1; only the consistent subset has copy 2
        assert out.where("copy_idx = 1").count() == n_web
        two = {r.doc_id for r in out.where("copy_idx = 2").collect()}
        bigger = {
            r.doc_id
            for r in replicate_mixture(
                df, "lang", {"web": 1.8}, "doc_id"
            ).where("copy_idx = 2").collect()
        }
        assert two <= bigger  # nested fractional epochs

    def test_zero_and_absent_groups_dropped(self, spark):
        from mysql_syncer_spark.operators.sampling import replicate_mixture

        df = self._docs(spark)
        out = replicate_mixture(df, "lang", {"de": 0.0}, "doc_id")
        assert out.count() == 0

    def test_determinism_under_repartition(self, spark):
        from mysql_syncer_spark.operators.sampling import replicate_mixture

        df = self._docs(spark)
        a = sorted(map(tuple, replicate_mixture(
            df, "lang", {"de": 2.5, "web": 0.5}, "doc_id").collect()))
        b = sorted(map(tuple, replicate_mixture(
            df.repartition(11), "lang", {"de": 2.5, "web": 0.5},
            "doc_id").collect()))
        assert a == b

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import replicate_mixture

        with _pytest.raises(ValueError):
            replicate_mixture(
                self._docs(spark), "lang", {"de": -1.0}, "doc_id"
            )

    def test_zero_shuffle_plan(self, spark, sf_dir):
        from mysql_syncer_spark import queries as registry

        df = registry.queries()["replicate_mixture_docs"](spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Arguments: hashpartitioning" not in plan, plan
        assert "Join" not in plan, plan


class TestTokenBudgetCut:
    """The exact budget cut equals the global take-while over the
    md5-priority order — verified against a driver-side reference —
    and is NESTED in the budget (a bigger budget strictly extends a
    smaller one's selection). Plan law: no corpus-wide window — the
    only per-row window is partitioned to the boundary bucket."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
        return spark.createDataFrame(rows, "id long, toks long")

    @staticmethod
    def _reference(rows, budget, salt=""):
        import hashlib

        ordered = sorted(
            rows, key=lambda r: (hashlib.md5(
                (salt + str(r[0])).encode()).hexdigest(), r[0])
        )
        kept, cum = [], 0
        for rid, t in ordered:
            if cum + t > budget:
                break
            cum += t
            kept.append(rid)
        return set(kept)

    def test_equals_global_take_while(self, spark, docs):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        rows = [(r["id"], r["toks"]) for r in docs.collect()]
        for budget in (0, 137, 1500, 10**9):
            got = {
                r["id"]
                for r in token_budget_cut(
                    docs, "id", "toks", budget
                ).collect()
            }
            assert got == self._reference(rows, budget), budget

    def test_budget_nesting(self, spark, docs):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        small = {r["id"] for r in
                 token_budget_cut(docs, "id", "toks", 800).collect()}
        big = {r["id"] for r in
               token_budget_cut(docs, "id", "toks", 2400).collect()}
        assert small < big

    def test_budget_respected_and_maximal(self, spark, docs):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        budget = 1234
        kept = token_budget_cut(docs, "id", "toks", budget)
        total = kept.agg(F.sum("toks")).first()[0]
        assert total <= budget
        # maximal: the next row in priority order would overflow
        rows = [(r["id"], r["toks"]) for r in docs.collect()]
        ref = self._reference(rows, budget)
        import hashlib

        ordered = sorted(rows, key=lambda r: (
            hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
        nxt = next((t for rid, t in ordered if rid not in ref), None)
        assert nxt is None or total + nxt > budget

    def test_null_tokens_excluded(self, spark):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        df = spark.createDataFrame(
            [(1, 5), (2, None), (3, 5)], "id long, toks long"
        )
        got = {r["id"] for r in
               token_budget_cut(df, "id", "toks", 100).collect()}
        assert got == {1, 3}

    def test_no_corpus_wide_window(self, spark, docs):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        out = token_budget_cut(docs, "id", "toks", 1000)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # every Window node must be partitioned (the boundary bucket);
        # the only unpartitioned window runs over the 4096-row
        # histogram, whose plan input is an Aggregate, never the corpus
        import re

        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_validation(self, docs):
        from mysql_syncer_spark.operators.sampling import token_budget_cut

        with pytest.raises(ValueError, match="budget"):
            token_budget_cut(docs, "id", "toks", -1)
        with pytest.raises(ValueError, match="bucket_hex"):
            token_budget_cut(docs, "id", "toks", 10, bucket_hex=0)


def test_token_budget_negative_tokens_raise(spark):
    """Round-9 ADVICE: a negative token count breaks the monotone
    running-total contract the bucket-prune equivalence rests on —
    must fail loudly at execution, not silently over-select."""
    from mysql_syncer_spark.operators.sampling import token_budget_cut

    df = spark.createDataFrame(
        [("a", 5), ("b", -1), ("c", 3)], "id string, toks long"
    )
    with pytest.raises(Exception, match="negative"):
        token_budget_cut(df, "id", "toks", 100).collect()


class TestTemperatureMixture:
    """operators/sampling.py temperature_mixture — shares ~ n^alpha."""

    def _df(self, spark):
        rows = []
        for g, n in (("a", 400), ("b", 100), ("c", 25)):
            rows += [(f"{g}{i}", g) for i in range(n)]
        return spark.createDataFrame(rows, "k string, g string")

    def test_alpha_one_is_identity(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        assert temperature_mixture(df, "g", "k", 1.0).count() == df.count()

    def test_alpha_zero_equalizes_to_smallest(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        out = (
            temperature_mixture(df, "g", "k", 0.0)
            .groupBy("g")
            .count()
            .collect()
        )
        assert {r.g: r["count"] for r in out} == {"a": 25, "b": 25, "c": 25}

    def test_shares_proportional_to_pow(self, spark):
        """alpha=0.5 on (400,100,25): weights (20,10,5); bottleneck is
        c (n/wt: 20,10,5 -> t=5) -> quotas floor(wt*5) = (100,50,25)."""
        from mysql_syncer_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        out = (
            temperature_mixture(df, "g", "k", 0.5)
            .groupBy("g")
            .count()
            .collect()
        )
        assert {r.g: r["count"] for r in out} == {"a": 100, "b": 50, "c": 25}

    def test_deterministic_and_salted(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            temperature_mixture,
        )

        df = self._df(spark)
        a = sorted(r.k for r in temperature_mixture(df, "g", "k", 0.5).collect())
        b = sorted(r.k for r in temperature_mixture(df, "g", "k", 0.5).collect())
        assert a == b
        c = sorted(
            r.k
            for r in temperature_mixture(df, "g", "k", 0.5, salt="s2").collect()
        )
        assert a != c  # same sizes, different membership
        assert len(a) == len(c)

    def test_negative_alpha_raises(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            temperature_mixture,
        )

        with pytest.raises(ValueError):
            temperature_mixture(self._df(spark), "g", "k", -0.1)


class TestUnimaxSample:
    """operators/sampling.py unimax_sample — closed-form waterfilling
    equals the paper's literal ascending allocation loop."""

    @staticmethod
    def _reference(counts, budget, cap):
        items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
        remaining, left, q = float(budget), len(items), {}
        for g, n in items:
            alloc = min(cap * n, remaining / left)
            q[g] = int(alloc // 1)
            remaining -= alloc
            left -= 1
        return {g: v for g, v in q.items() if v > 0}

    def test_matches_allocation_loop_random(self, spark):
        import random

        from mysql_syncer_spark.operators.sampling import unimax_sample

        rng = random.Random(17)
        for _ in range(4):
            groups = {
                f"g{j}": rng.randint(1, 150)
                for j in range(rng.randint(2, 6))
            }
            budget = rng.randint(0, 2 * sum(groups.values()))
            cap = rng.choice([0.7, 1.0, 2.0, 3.0])
            rows = [
                (f"{g}_{i}", g)
                for g, n in groups.items()
                for i in range(n)
            ]
            df = spark.createDataFrame(rows, "k string, g string")
            got = {
                r.g: r["count"]
                for r in unimax_sample(df, "g", "k", budget, cap)
                .groupBy("g")
                .count()
                .collect()
            }
            assert got == self._reference(groups, budget, cap), (
                groups,
                budget,
                cap,
            )

    def test_replication_is_exact_and_indexed(self, spark):
        """A capped group replicates exactly: quota 2n means every row
        appears twice with copy_idx 1 and 2."""
        from mysql_syncer_spark.operators.sampling import unimax_sample

        rows = [(f"a{i}", "a") for i in range(10)] + [
            (f"b{i}", "b") for i in range(500)
        ]
        df = spark.createDataFrame(rows, "k string, g string")
        out = unimax_sample(df, "g", "k", 400, 2.0).collect()
        a_rows = [r for r in out if r.g == "a"]
        assert len(a_rows) == 20  # capped: 2 full epochs of 10
        from collections import Counter

        per_key = Counter(r.k for r in a_rows)
        assert set(per_key.values()) == {2}
        assert sorted(
            set((r.k, r.copy_idx) for r in a_rows if r.k == "a0")
        ) == [("a0", 1), ("a0", 2)]
        assert sum(1 for r in out if r.g == "b") == 380  # share

    def test_budget_zero_and_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import unimax_sample

        df = spark.createDataFrame([("x", "a")], "k string, g string")
        assert unimax_sample(df, "g", "k", 0, 2.0).count() == 0
        with _pytest.raises(ValueError):
            unimax_sample(df, "g", "k", -1, 2.0)
        with _pytest.raises(ValueError):
            unimax_sample(df, "g", "k", 10, 0.0)

    def test_cap_binds_total_below_budget(self, spark):
        """Budget above cap*corpus: every group caps, total = floor
        sums, budget deliberately NOT spent (the UniMax point)."""
        from mysql_syncer_spark.operators.sampling import unimax_sample

        rows = [(f"a{i}", "a") for i in range(10)] + [
            (f"b{i}", "b") for i in range(20)
        ]
        df = spark.createDataFrame(rows, "k string, g string")
        out = unimax_sample(df, "g", "k", 10_000, 1.5)
        assert out.count() == 15 + 30


class TestUnimaxTokens:
    """Token-budget UniMax: waterfilling on token totals + exact full
    epochs + the per-group two-level take-while remainder."""

    @staticmethod
    def _reference(rows, budget, cap):
        import hashlib
        from collections import defaultdict

        totals = defaultdict(int)
        for k, g, t in rows:
            totals[g] += t
        items = sorted(totals.items(), key=lambda kv: (kv[1], kv[0]))
        remaining, left, q = float(budget), len(items), {}
        for g, n in items:
            alloc = min(cap * n, remaining / left)
            q[g] = int(alloc // 1)
            remaining -= alloc
            left -= 1
        out = []
        for g, quota in q.items():
            total = totals[g]
            if quota <= 0 or total <= 0:
                continue
            e, rem = quota // total, quota % total
            for k, gg, t in rows:
                if gg == g:
                    out.extend((k, ci) for ci in range(1, e + 1))
            run = 0
            ordered = sorted(
                (hashlib.md5(k.encode()).hexdigest(), k, t)
                for k, gg, t in rows
                if gg == g
            )
            for _, k, t in ordered:
                if run + t <= rem:
                    run += t
                    out.append((k, e + 1))
                else:
                    break
        return sorted(out)

    def test_matches_reference_random(self, spark):
        import random

        from mysql_syncer_spark.operators.sampling import unimax_tokens

        rng = random.Random(13)
        for _ in range(3):
            rows = []
            for j in range(rng.randint(2, 5)):
                for i in range(rng.randint(3, 40)):
                    rows.append((f"g{j}_{i}", f"g{j}", rng.randint(0, 50)))
            budget = rng.randint(0, 2 * sum(t for *_, t in rows))
            cap = rng.choice([0.8, 1.0, 2.0, 2.5])
            df = spark.createDataFrame(rows, "k string, g string, tok int")
            got = sorted(
                (r.k, r.copy_idx)
                for r in unimax_tokens(
                    df, "g", "k", "tok", budget, cap
                ).collect()
            )
            assert got == self._reference(rows, budget, cap), (budget, cap)

    def test_token_quota_never_exceeded(self, spark):
        from mysql_syncer_spark.operators.sampling import unimax_tokens

        rows = [(f"a{i}", "a", 10) for i in range(30)] + [
            (f"b{i}", "b", 10) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "k string, g string, tok int")
        budget, cap = 1000, 2.0
        out = unimax_tokens(df, "g", "k", "tok", budget, cap).collect()
        per_group = {}
        for r in out:
            per_group[r.g] = per_group.get(r.g, 0) + 10
        # a: total 300 -> alloc min(cap 600, share 500) = 500
        #   (1 full epoch = 300 + a 200-token partial prefix)
        # b: the remaining 500
        assert per_group == {"a": 500, "b": 500}

    def test_negative_tokens_raise(self, spark):
        from mysql_syncer_spark.operators.sampling import unimax_tokens

        df = spark.createDataFrame(
            [("x", "a", -1)], "k string, g string, tok int"
        )
        with pytest.raises(Exception, match="negative"):
            unimax_tokens(df, "g", "k", "tok", 10, 1.0).collect()

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.sampling import unimax_tokens

        df = spark.createDataFrame([("x", "a", 1)], "k string, g string, tok int")
        with pytest.raises(ValueError):
            unimax_tokens(df, "g", "k", "tok", -1, 1.0)
        with pytest.raises(ValueError):
            unimax_tokens(df, "g", "k", "tok", 10, 0)
        with pytest.raises(ValueError):
            unimax_tokens(df, "g", "k", "tok", 10, 1.0, bucket_hex=0)


class TestNullGroupKeys:
    """NULL group keys are ordinary groups (ADVICE r9): the quota joins
    go through a struct-wrapped key, so NULL-group rows are allocated
    and delivered like any other group instead of silently dropped."""

    def _df(self, spark):
        rows = [(f"a{i}", "a", 10) for i in range(8)]
        rows += [(f"n{i}", None, 10) for i in range(4)]
        return spark.createDataFrame(rows, "k string, g string, tok int")

    def test_temperature_alpha1_identity_with_null_group(self, spark):
        from mysql_syncer_spark.operators.sampling import temperature_mixture

        df = self._df(spark)
        out = temperature_mixture(df, "g", "k", alpha=1.0).collect()
        assert len(out) == df.count()  # identity law now holds for NULLs
        assert sum(1 for r in out if r.g is None) == 4

    def test_temperature_alpha0_equalizes_null_group(self, spark):
        from mysql_syncer_spark.operators.sampling import temperature_mixture

        df = self._df(spark)
        out = temperature_mixture(df, "g", "k", alpha=0.0).collect()
        by_g = {}
        for r in out:
            by_g[r.g] = by_g.get(r.g, 0) + 1
        # alpha=0: every group downsampled to the smallest group (4)
        assert by_g == {"a": 4, None: 4}

    def test_unimax_sample_allocates_null_group(self, spark):
        from mysql_syncer_spark.operators.sampling import unimax_sample

        df = self._df(spark)
        out = unimax_sample(df, "g", "k", target_rows=8, max_epochs=1.0)
        by_g = {}
        for r in out.collect():
            by_g[r.g] = by_g.get(r.g, 0) + 1
        # uniform split of 8 across both groups, capped at 1 epoch
        assert by_g == {"a": 4, None: 4}

    def test_unimax_tokens_allocates_null_group(self, spark):
        from mysql_syncer_spark.operators.sampling import unimax_tokens

        df = self._df(spark)
        out = unimax_tokens(
            df, "g", "k", "tok", token_budget=80, max_epochs=1.0
        )
        tok = {}
        for r in out.collect():
            tok[r.g] = tok.get(r.g, 0) + 10
        assert tok == {"a": 40, None: 40}


class TestWeightedReservoir:
    """E178 A-ES weighted sampling laws (operators/sampling.py)."""

    def _df(self, spark):
        # weights 1 vs 100: heavy keys must dominate the sample
        rows = [(i, 100 if i < 50 else 1) for i in range(1000)]
        return spark.createDataFrame(rows, "k long, w long")

    def test_weight_proportionality_and_determinism(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        df = self._df(spark)
        a = weighted_reservoir_sample(df, "k", "w", k=50).collect()
        b = weighted_reservoir_sample(df, "k", "w", k=50).collect()
        assert [r.k for r in a] == [r.k for r in b]  # deterministic
        assert len(a) == 50
        heavy = sum(1 for r in a if r.k < 50)
        # 50 heavy keys at weight 100 vs 950 light at weight 1:
        # heavy mass share = 5000/5950 — the sample must be mostly heavy
        assert heavy >= 30, heavy
        # rank keys are sorted desc — top-k, not arbitrary-k
        ranks = [r.rank_key for r in a]
        assert ranks == sorted(ranks, reverse=True)

    def test_salt_decorrelates_and_zero_weight_excluded(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        df = self._df(spark)
        a = {r.k for r in weighted_reservoir_sample(df, "k", "w", 50).collect()}
        c = {r.k for r in weighted_reservoir_sample(
            df, "k", "w", 50, salt="other").collect()}
        assert a != c
        z = spark.createDataFrame(
            [(1, 0), (2, -3), (3, None), (4, 5)], "k long, w int"
        )
        out = weighted_reservoir_sample(z, "k", "w", 10).collect()
        assert [r.k for r in out] == [4]

    def test_no_global_sort_in_plan(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        df = self._df(spark)
        plan = (
            weighted_reservoir_sample(df, "k", "w", 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        with _pytest.raises(ValueError, match="k must be"):
            weighted_reservoir_sample(self._df(spark), "k", "w", 0)


class TestWeightedReservoirGrouped:
    """E181 stratified A-ES laws."""

    def test_per_group_k_and_consistency_with_global(self, spark):
        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample_grouped,
        )

        rows = [(i, "g1" if i % 2 else "g2", 10 + i % 7) for i in range(400)]
        df = spark.createDataFrame(rows, "k long, g string, w long")
        out = weighted_reservoir_sample_grouped(
            df, ["g"], "k", "w", k=15
        ).collect()
        by = {}
        for r in out:
            by.setdefault(r.g, []).append(r)
        assert set(by) == {"g1", "g2"}
        for g, rs in by.items():
            assert len(rs) == 15, (g, len(rs))
            ranks = [r.rank_key for r in rs]
            assert sorted(ranks, reverse=True) == sorted(
                ranks, key=lambda x: -x
            )
        # same rank key as the global form: a group's winners are the
        # global winners restricted to that group
        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        g1 = df.where("g = 'g1'")
        glob = {r.k for r in weighted_reservoir_sample(g1, "k", "w", 15).collect()}
        strat = {r.k for r in by["g1"]}
        assert glob == strat

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import (
            weighted_reservoir_sample_grouped,
        )

        df = spark.createDataFrame([(1, "a", 2)], "k long, g string, w long")
        with _pytest.raises(ValueError, match="k must be"):
            weighted_reservoir_sample_grouped(df, ["g"], "k", "w", 0)


class TestStratifiedKfold:
    """E193 stratified k-fold laws (operators/sampling.py)."""

    def _docs(self, spark, sizes):
        rows = [
            (lang, lang * 3 + str(i))
            for lang, n in sizes.items()
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "lang string, doc_id string")

    def test_per_stratum_balance_at_most_one(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_kfold

        df = self._docs(spark, {"en": 23, "de": 7, "zh": 3, "fr": 5})
        out = stratified_kfold(df, ["lang"], "doc_id", k=5)
        sizes = {
            (r.lang, r.fold): r.n
            for r in out.groupBy("lang", "fold")
            .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"))
            .collect()
        }
        import collections
        per_lang = collections.defaultdict(list)
        for (lang, fold), n in sizes.items():
            per_lang[lang].append(n)
        for lang, counts in per_lang.items():
            assert max(counts) - min(counts) <= 1, (lang, counts)
        # every row got a fold in range
        assert out.where("fold < 0 OR fold > 4").count() == 0

    def test_deterministic_and_salt_sensitivity(self, spark):
        from mysql_syncer_spark.operators.sampling import stratified_kfold

        df = self._docs(spark, {"en": 40})
        a = {r.doc_id: r.fold for r in
             stratified_kfold(df, ["lang"], "doc_id", k=4, salt="s").collect()}
        b = {r.doc_id: r.fold for r in
             stratified_kfold(df, ["lang"], "doc_id", k=4, salt="s").collect()}
        c = {r.doc_id: r.fold for r in
             stratified_kfold(df, ["lang"], "doc_id", k=4, salt="t").collect()}
        assert a == b                      # same salt: stable
        assert a != c                      # salt redraws the deal

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.sampling import stratified_kfold

        df = self._docs(spark, {"en": 3})
        with _pytest.raises(ValueError, match="k must"):
            stratified_kfold(df, ["lang"], "doc_id", k=1)
