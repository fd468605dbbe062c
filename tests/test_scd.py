"""SCD type-2 history merge: multi-batch evolution invariants."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.scd import scd2_apply, scd2_as_of, scd2_current, scd2_init

PK = ["id"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, score double")


@pytest.fixture()
def batches(spark):
    b0 = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    # ts=1: 2 changed, 3 deleted, 4 new
    b1 = _snap(spark, [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)])
    # ts=2: 2 changed again, 3 resurrected, 1 unchanged
    b2 = _snap(spark, [(1, "a", 1.0), (2, "BB", 2.5), (3, "c", 3.0),
                       (4, "d", 4.0)])
    return b0, b1, b2


def _apply_all(batches):
    b0, b1, b2 = batches
    h = scd2_init(b0, 0)
    h = scd2_apply(h, b1, PK, 1)
    return scd2_apply(h, b2, PK, 2)


def test_current_state_equals_last_snapshot(batches):
    h = _apply_all(batches)
    cur = scd2_current(h)
    last = batches[2]
    assert cur.subtract(last).count() == 0
    assert last.subtract(cur).count() == 0


def test_version_chains(batches):
    h = _apply_all(batches)
    rows = {
        (r["id"], r["valid_from"]): (r["val"], r["score"], r["valid_to"])
        for r in h.collect()
    }
    assert rows[(1, 0)] == ("a", 1.0, None)          # never changed
    assert rows[(2, 0)] == ("b", 2.0, 1)             # closed at 1
    assert rows[(2, 1)] == ("B", 2.0, 2)             # closed at 2
    assert rows[(2, 2)] == ("BB", 2.5, None)         # current
    assert rows[(3, 0)] == ("c", 3.0, 1)             # deleted at 1
    assert rows[(3, 2)] == ("c", 3.0, None)          # resurrected at 2
    assert rows[(4, 1)] == ("d", 4.0, None)
    assert len(rows) == 7


def test_invariants_one_open_row_per_pk_no_overlap(batches):
    h = _apply_all(batches)
    open_counts = (
        h.where(F.col("valid_to").isNull()).groupBy("id").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)
    bad = h.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    )
    assert bad.count() == 0
    # intervals of one pk never overlap: for each id, sorted intervals
    # have from >= previous to
    per_id = {}
    for r in h.collect():
        per_id.setdefault(r["id"], []).append(
            (r["valid_from"], r["valid_to"])
        )
    for iid, spans in per_id.items():
        spans.sort()
        for (f1, t1), (f2, _) in zip(spans, spans[1:]):
            assert t1 is not None and f2 >= t1, (iid, spans)


def test_idempotent_reapply(batches):
    b0, b1, _ = batches
    h = scd2_apply(scd2_init(b0, 0), b1, PK, 1)
    h2 = scd2_apply(h, b1, PK, 2)  # same snapshot again -> no change
    assert h2.subtract(h).count() == 0 and h.subtract(h2).count() == 0


def test_as_of_time_travel(batches):
    h = _apply_all(batches)
    asof1 = scd2_as_of(h, 1)
    want = batches[1]
    assert asof1.subtract(want).count() == 0
    assert want.subtract(asof1).count() == 0


def test_keep_hash_chain_identical_and_clean_schema(batches):
    """r13: keep_hash carries each open row's content hash into the
    next fold (fold N+1 classifies against the carried hash instead of
    re-hashing the open side). The chain must be row-identical to the
    plain chain, intermediate histories carry SCD2_HASH, and a final
    keep_hash=False fold consumes the carry and emits the clean
    schema."""
    from mysql_syncer_spark.scd import SCD2_HASH

    b0, b1, b2 = batches
    plain = scd2_apply(
        scd2_apply(scd2_init(b0, 0), b1, PK, 1), b2, PK, 2
    )
    mid = scd2_apply(scd2_init(b0, 0), b1, PK, 1, keep_hash=True)
    assert SCD2_HASH in mid.columns
    # open rows carry their hash; closed rows carry NULL
    assert mid.where(
        F.col("valid_to").isNull() & F.col(SCD2_HASH).isNull()
    ).count() == 0
    assert mid.where(
        F.col("valid_to").isNotNull() & F.col(SCD2_HASH).isNotNull()
    ).count() == 0
    carried = scd2_apply(mid, b2, PK, 2)
    assert carried.columns == plain.columns
    assert sorted(map(tuple, carried.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # keep_hash mid-chain equals the plain mid-chain modulo the column
    mid_plain = scd2_apply(scd2_init(b0, 0), b1, PK, 1)
    assert sorted(map(tuple, mid.drop(SCD2_HASH).collect())) == sorted(
        map(tuple, mid_plain.collect())
    )


def test_hash_cols_restricts_change_detection(spark):
    b0 = _snap(spark, [(1, "a", 1.0)])
    b1 = _snap(spark, [(1, "a", 99.0)])  # only score changed
    h = scd2_apply(scd2_init(b0, 0), b1, PK, 1, hash_cols=["id", "val"])
    # score is not part of the content hash -> no new version
    assert h.count() == 1 and h.first()["valid_to"] is None


class TestScd2LookupJoin:
    def test_version_routing_and_tombstones(self, spark):
        from mysql_syncer_spark.scd import (
            scd2_apply, scd2_init, scd2_lookup_join,
        )

        v0 = spark.createDataFrame(
            [(1, "a0"), (2, "b0"), (3, "c0")], "pk long, v string"
        )
        v1 = spark.createDataFrame(
            [(1, "a1"), (3, "c0")], "pk long, v string"  # 1 changed, 2 gone
        )
        hist = scd2_apply(scd2_init(v0, 0), v1, ["pk"], 1)
        facts = spark.createDataFrame(
            [(1, 0), (1, 1), (2, 0), (2, 1), (3, 1), (9, 1)],
            "pk long, at long",
        )
        got = {
            (r.pk, r.at): (r.dim_v, r.dim_version_from)
            for r in scd2_lookup_join(
                facts, hist, ["pk"], "at", how="left"
            ).collect()
        }
        assert got[(1, 0)] == ("a0", 0)   # old version at t0
        assert got[(1, 1)] == ("a1", 1)   # new version at t1
        assert got[(2, 0)] == ("b0", 0)   # existed at t0
        assert got[(2, 1)] == (None, None)  # tombstone read
        assert got[(3, 1)] == ("c0", 0)   # unchanged keeps version 0
        assert got[(9, 1)] == (None, None)  # never existed

    def test_inner_drops_unmatched(self, spark):
        from mysql_syncer_spark.scd import (
            scd2_init, scd2_lookup_join,
        )

        hist = scd2_init(
            spark.createDataFrame([(1, "a")], "pk long, v string"), 5
        )
        facts = spark.createDataFrame(
            [(1, 4), (1, 5)], "pk long, at long"
        )
        got = scd2_lookup_join(facts, hist, ["pk"], "at").collect()
        # as_of 4 predates the first version -> dropped under inner
        assert len(got) == 1 and got[0].at == 5

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.scd import scd2_init, scd2_lookup_join

        hist = scd2_init(
            spark.createDataFrame([(1, "a")], "pk long, v string"), 0
        )
        facts = spark.createDataFrame([(1, 0)], "pk long, at long")
        with _pytest.raises(ValueError):
            scd2_lookup_join(facts, hist, ["pk"], "at", how="full")
