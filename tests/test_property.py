"""Property-based convergence tests (SURVEY.md §5.3, hypothesis):
random tables + random perturbations ⇒ sync converges and re-diff is
empty. Examples are kept small and few — each example spins real Spark
jobs."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_syncer_spark.canon import with_row_hash
from mysql_syncer_spark.diff import diff_tables, merge_tables
from mysql_syncer_spark.digest import digests_equal

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.DoubleType(), True),
    ]
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),                     # id
        st.one_of(st.none(), st.integers(-5, 5)),                   # a
        st.one_of(st.none(), st.text("xyz#',\\", max_size=4)),      # b
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=32)),                  # c
    ),
    max_size=12,
    unique_by=lambda t: t[0],  # unique PK
)

perturb_strategy = st.tuples(
    st.sets(st.integers(0, 30), max_size=5),   # ids to drop on slave
    st.sets(st.integers(0, 30), max_size=5),   # ids to mutate on slave
)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, perturb=perturb_strategy)
def test_merge_converges_on_random_tables(spark, rows, perturb):
    master = spark.createDataFrame(rows, SCHEMA)
    drop_ids, mutate_ids = perturb
    slave = master.where(~F.col("id").isin(list(drop_ids)) if drop_ids else F.lit(True))
    if mutate_ids:
        slave = slave.withColumn(
            "a",
            F.when(
                F.col("id").isin(list(mutate_ids)),
                F.coalesce(F.col("a"), F.lit(0)) + 100,
            ).otherwise(F.col("a")),
        )
    merged = merge_tables(master, slave, ["id"])
    # convergence: merged ≡ master (exact multiset equality)
    assert merged.exceptAll(master).count() == 0
    assert master.exceptAll(merged).count() == 0
    # idempotence: digests agree and a re-diff plans nothing
    assert digests_equal(master, merged)
    d = diff_tables(master, merged, ["id"], mode="pk_hash")
    assert d["insert"].count() == 0 and d["delete"].count() == 0


@pytest.mark.slow
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_digest_iff_equal(spark, rows):
    """digests_equal(a, b) is true iff the tables are content-equal —
    the short-circuit must never skip a real difference (soundness) nor
    row-diff identical tables (economy)."""
    master = spark.createDataFrame(rows, SCHEMA)
    same = spark.createDataFrame(list(reversed(rows)), SCHEMA)
    assert digests_equal(master, same)
    if rows:
        tweaked_rows = [
            (rows[0][0], (rows[0][1] or 0) + 1, rows[0][2], rows[0][3])
        ] + rows[1:]
        tweaked = spark.createDataFrame(tweaked_rows, SCHEMA)
        assert not digests_equal(master, tweaked)


@pytest.mark.slow
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    layout=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 3)),
                  st.one_of(st.none(), st.integers(0, 3)),
                  st.one_of(st.none(), st.integers(0, 3))),
        min_size=2, max_size=6,
    )
)
def test_null_layouts_never_collide(spark, layout):
    """Generalized NullColumnTest: two rows hash equal iff their full
    NULL-layout-sensitive canonical form is equal."""
    df = spark.createDataFrame(
        [(i, *t) for i, t in enumerate(layout)],
        "id long, a int, b int, c int",
    )
    hashed = with_row_hash(df, ["id"], hash_cols=["a", "b", "c"]).collect()
    by_id = {r["id"]: r["__row_hash"] for r in hashed}
    for i, ti in enumerate(layout):
        for j, tj in enumerate(layout):
            if i < j:
                assert (by_id[i] == by_id[j]) == (ti == tj), (ti, tj)
