"""Connected-component dedup clustering: pairs → clusters → survivors."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.cluster import (
    _union_find_roots,
    cluster_survivors,
    dedup_by_clusters,
    duplicate_clusters,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_union_find_matches_bfs(edges):
    """Driver union-find (min-id roots) ≡ BFS components on random
    graphs, self-loops and duplicate edges included."""
    roots = _union_find_roots(edges)
    # reference: BFS from every node over the undirected adjacency
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    seen: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp: set[int] = set()
        stack = [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        m = min(comp)
        for n in comp:
            expected[n] = m
    assert roots == expected


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_components_merge_transitively(spark):
    """a~b, b~c must land in ONE cluster even though (a,c) was never a
    pair — the property pair lists alone can't give you."""
    cl = duplicate_clusters(_pairs(spark, [(1, 2), (2, 3), (7, 8)]))
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_chain_converges(spark):
    """A 12-node chain needs multiple propagation rounds (diameter >
    cluster-typical); must still converge within the iteration bound."""
    chain = [(i, i + 1) for i in range(1, 12)]
    cl = duplicate_clusters(_pairs(spark, chain))
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {i: 1 for i in range(1, 13)}


def test_chain_converges_distributed_path(spark):
    """driver_edge_limit=0 forces the distributed propagation loop (the
    100 TB path where the contracted remainder exceeds the driver
    bound); must produce the identical labeling."""
    chain = [(i, i + 1) for i in range(1, 12)]
    cl = duplicate_clusters(_pairs(spark, chain), driver_edge_limit=0)
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {i: 1 for i in range(1, 13)}


def test_unconnected_nodes_absent(spark):
    cl = duplicate_clusters(_pairs(spark, [(5, 9)]))
    assert {r["doc_id"] for r in cl.collect()} == {5, 9}


def test_survivors_and_dedup(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    clusters = duplicate_clusters(pairs)
    surv = {
        r["cluster_id"]: (r["keep_id"], r["n_docs"])
        for r in cluster_survivors(clusters).collect()
    }
    assert surv == {1: (1, 3), 7: (7, 2)}
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 10)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_by_clusters(corpus, clusters).collect()
    )
    # 2,3 fold into 1; 8 folds into 7; 4,5,6,9 were never clustered
    assert kept == [1, 4, 5, 6, 7, 9]


def test_long_chain_converges_via_recontraction(spark):
    """A 60-node path with max_iter=1 exceeds what one propagation
    round can label (reach ~6 hops); the resolver must re-contract the
    partially-labeled graph and recurse with a doubled round budget
    instead of raising. driver_edge_limit=0 keeps every level on the
    distributed path."""
    cl = duplicate_clusters(
        _pairs(spark, [(i, i + 1) for i in range(1, 60)]),
        max_iter=1,
        driver_edge_limit=0,
    )
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {i: 1 for i in range(1, 61)}


def test_raw_pair_driver_path_matches_distributed(spark):
    """The r12 driver fast path (raw pair list within driver_edge_limit
    → one Arrow collect + numpy union-find, no contraction jobs) must
    label exactly like the distributed contraction+propagation path on
    a graph mixing cliques, a chain, duplicate and reversed edges, and
    a self-loop."""
    edges = (
        [(1, 2), (2, 3), (3, 1)]          # clique
        + [(10, 11), (11, 12), (12, 13)]  # chain
        + [(20, 21), (21, 20), (20, 21)]  # duplicate + reversed
        + [(30, 30)]                      # self-loop
    )
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(_pairs(spark, edges)).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(
            _pairs(spark, edges), driver_edge_limit=0
        ).collect()
    }
    assert fast == dist
    assert fast == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
        (30, 30),
    }


def test_string_ids_driver_path(spark):
    """Non-integer doc ids (UUID-style strings) through the driver
    union-find path: mapping schema must derive from the id type, and
    cluster_id is the lexicographic component min."""
    pairs = spark.createDataFrame(
        [("uuid-b", "uuid-a"), ("uuid-b", "uuid-c"), ("uuid-x", "uuid-y")],
        "id_a string, id_b string",
    )
    cl = duplicate_clusters(pairs, driver_edge_limit=2_000_000)
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {
        "uuid-a": "uuid-a", "uuid-b": "uuid-a", "uuid-c": "uuid-a",
        "uuid-x": "uuid-x", "uuid-y": "uuid-x",
    }


class TestGoldenRecords:
    """Column-wise survivorship merge: each value column independently
    takes its most recent NON-NULL value — producing a row no single
    member equals (the case row-pick keep-best cannot serve)."""

    @pytest.fixture(scope="class")
    def recs(self, spark):
        rows = [
            # cluster 1: newest row (t=3) has email NULL, phone set;
            # older row (t=2) has the email; oldest (t=1) both
            (1, 1, "old@x", "111"),
            (1, 2, "new@x", None),
            (1, 3, None, "333"),
            # cluster 2: single member
            (2, 1, "solo@x", None),
            # cluster 3: email NULL everywhere
            (3, 1, None, "900"),
            (3, 2, None, None),
        ]
        return spark.createDataFrame(
            rows, "cid long, ts long, email string, phone string"
        )

    def test_columnwise_merge(self, spark, recs):
        from mysql_syncer_spark.operators.cluster import golden_records

        out = {
            r["cid"]: r
            for r in golden_records(
                recs, ["cid"], ["ts"], ["email", "phone"]
            ).collect()
        }
        # the golden row for cluster 1 matches NO single member
        assert out[1]["email"] == "new@x" and out[1]["phone"] == "333"
        assert out[1]["n_records"] == 3
        assert out[2]["email"] == "solo@x" and out[2]["phone"] is None
        # all-NULL column stays NULL; latest non-null phone survives
        assert out[3]["email"] is None and out[3]["phone"] == "900"

    def test_tiebreak_via_order_cols(self, spark):
        from mysql_syncer_spark.operators.cluster import golden_records

        rows = [(1, 5, 1, "a"), (1, 5, 2, "b")]  # same ts, id breaks
        df = spark.createDataFrame(
            rows, "cid long, ts long, id long, v string"
        )
        out = golden_records(df, ["cid"], ["ts", "id"], ["v"]).first()
        assert out["v"] == "b"

    def test_single_shuffle_no_join(self, spark, recs):
        from mysql_syncer_spark.operators.cluster import golden_records

        out = golden_records(recs, ["cid"], ["ts"], ["email", "phone"])
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Join" not in plan
        assert plan.count(") Exchange") <= 2  # partial/final agg pair

    def test_validation(self, recs):
        from mysql_syncer_spark.operators.cluster import golden_records

        with pytest.raises(ValueError, match="order_cols"):
            golden_records(recs, ["cid"], [], ["email"])
        with pytest.raises(ValueError, match="value_cols"):
            golden_records(recs, ["cid"], ["ts"], [])
        with pytest.raises(ValueError, match="overlap"):
            golden_records(recs, ["cid"], ["ts"], ["ts"])


class TestSimhashDuplicateClusters:
    """simhash_duplicate_clusters ≡ duplicate_clusters(simhash pairs):
    the signature-cardinality component path must emit the exact same
    (doc_id, cluster_id) set as the doc-pair expansion it replaces."""

    @pytest.fixture()
    def corpus(self, spark):
        # identical-doc groups (Hamming 0, incl. a 4-doc mega-group),
        # near-dup chains that only connect transitively, and unique
        # docs that must stay unemitted
        rows = []
        for i in range(4):  # identical mega-group
            rows.append((i, "the quick brown fox jumps over the lazy dog"))
        rows.append((10, "the quick brown fox jumps over the lazy cat"))
        rows.append((11, "a quick brown fox jumps over the lazy cat"))
        for i in range(20, 23):  # second identical group
            rows.append((i, "lorem ipsum dolor sit amet consectetur"))
        rows.append((30, "completely unrelated text about databases"))
        rows.append((31, "another singleton document mentioning spark"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.mark.parametrize("max_bits", [1, 3])
    @pytest.mark.parametrize("edge_limit", [2_000_000, 0])
    def test_equivalent_to_doc_pair_path(
        self, spark, corpus, max_bits, edge_limit
    ):
        # edge_limit=0 forces the distributed tail; the default takes
        # the driver union-find tail — both must match the doc-pair path
        from mysql_syncer_spark.operators import dedup
        from mysql_syncer_spark.operators.cluster import (
            simhash_duplicate_clusters,
        )

        old = duplicate_clusters(
            dedup.simhash_near_dup_pairs(corpus, max_bits=max_bits)
        )
        new = simhash_duplicate_clusters(
            corpus, max_bits=max_bits, driver_edge_limit=edge_limit
        )
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
        assert new.count() == old.count()

    def test_identical_group_without_near_signature(self, spark, corpus):
        """A signature shared by >= 2 docs clusters its copies even when
        no OTHER signature is within Hamming range (the multiplicity
        branch, not the rep-pair branch)."""
        from mysql_syncer_spark.operators.cluster import (
            simhash_duplicate_clusters,
        )

        out = {
            (r.doc_id, r.cluster_id)
            for r in simhash_duplicate_clusters(corpus, max_bits=1).collect()
        }
        # second identical group is isolated: all three docs -> min id 20
        assert {(20, 20), (21, 20), (22, 20)} <= out
        # singletons never appear
        assert not any(d in (30, 31) for d, _ in out)
