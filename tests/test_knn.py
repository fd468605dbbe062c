"""kNN graph (operators/similarity.knn_graph): exact correctness on a
hand-checkable corpus + LSH-blocked recall gate vs the exact graph."""

import math

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.similarity import knn_graph


@pytest.fixture(scope="module")
def vectors(spark):
    # 2-D toy corpus: angles make the neighbor order obvious
    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [
        (1, vec(0)),
        (2, vec(10)),    # nearest to 1
        (3, vec(30)),
        (4, vec(180)),   # opposite: everyone's farthest
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_exact_graph(vectors):
    out = knn_graph(vectors, k=2, block=False).collect()
    got = {(r["id_a"], r["rank"]): r["id_b"] for r in out}
    # every vector gets exactly k edges
    assert len(out) == 4 * 2
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3
    assert got[(2, 1)] == 1 and got[(2, 2)] == 3
    assert got[(3, 1)] == 2 and got[(3, 2)] == 1
    # 4's least-far neighbors still rank deterministically
    assert got[(4, 1)] == 3
    # self-edges excluded
    assert all(r["id_a"] != r["id_b"] for r in out)


def test_exact_tie_break_by_id(spark):
    rows = [
        (1, [1.0, 0.0]),
        (5, [2.0, 0.0]),   # same direction as 3 -> cosine tie with it
        (3, [3.0, 0.0]),
        (9, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(df, k=2, block=False).collect()
    got = {(r["id_a"], r["rank"]): r["id_b"] for r in out}
    # 1's neighbors 5 and 3 tie at cosine 1.0 -> lower id first
    assert got[(1, 1)] == 3 and got[(1, 2)] == 5


def test_lsh_recall_on_clustered_corpus(spark):
    """On clustered embeddings (the real-corpus shape) the multi-probe
    blocked graph recovers nearly all exact edges at a SMALL candidate
    fraction — in-cluster sign patterns agree, so neighbors share
    buckets."""
    import random

    rng = random.Random(7)
    centers = []
    for c in range(8):
        centers.append([rng.choice([-1.0, 1.0]) for _ in range(16)])
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append(
            (i, [x + rng.uniform(-0.3, 0.3) for x in c])
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in knn_graph(emb, k=5, block=False).collect()
    }
    approx = knn_graph(
        emb, k=5, block="lsh", lsh_bits=8, probe_radius=1
    ).collect()
    hits = {(r["id_a"], r["id_b"]) for r in approx}
    recall = len(hits & exact) / len(exact)
    # candidate fraction is ~9/256 = 3.5%; recall must sit FAR above it
    assert recall >= 0.9, recall
    per = {}
    for r in approx:
        per[r["id_a"]] = per.get(r["id_a"], 0) + 1
    assert max(per.values()) <= 5


def test_lsh_recall_floor_on_unstructured_fixture(spark, sf_dir):
    """On unstructured vectors recall approaches the candidate
    fraction (the no-free-lunch floor) — multi-probe radius 2 at 4
    bits covers ~69% of the corpus and must recover well above half
    the exact edges."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in knn_graph(emb, k=5, block=False).collect()
    }
    approx = knn_graph(
        emb, k=5, block="lsh", lsh_bits=4, probe_radius=2
    ).collect()
    hits = {(r["id_a"], r["id_b"]) for r in approx}
    recall = len(hits & exact) / len(exact)
    assert recall >= 0.6, recall


def test_probe_radius_validation(vectors):
    with pytest.raises(ValueError, match="probe_radius"):
        knn_graph(vectors, probe_radius=3)


def test_block_validation(vectors):
    with pytest.raises(ValueError, match="block"):
        knn_graph(vectors, block="ivf")


# ---------------------------------------------------------------------
# graph quality propagation (E120)
# ---------------------------------------------------------------------

def test_propagate_scores_hand_computed(spark):
    """5-node graph, 2 rounds, every value hand-derived.

    Edges: 1->{2,3}, 2->{1}, 3->{4}, 4->{5}, 5->{1}; node 6 isolated.
    s0 = {1:100, 2:200, 3:300, 4:400, 5:0, 6:500}.
    Round 1 (s' = (s0 + floor-mean(out-neighbors)) div 2):
      1: m=(200+300)//2=250 -> (100+250)//2=175
      2: m=100              -> 150
      3: m=400              -> 350
      4: m=0                -> 200
      5: m=100              -> 50
      6: no edges           -> 500
    Round 2 (means over round-1 scores):
      1: m=(150+350)//2=250 -> 175
      2: m=175              -> (200+175)//2=187
      3: m=200              -> 250
      4: m=50               -> 225
      5: m=175              -> 87
      6:                    -> 500
    """
    from mysql_syncer_spark.operators.similarity import propagate_scores

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 4), (4, 5), (5, 1)],
        "id_a LONG, id_b LONG",
    )
    seeds = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, 400), (5, 0), (6, 500)],
        "id LONG, score_micro LONG",
    )
    one = {
        r["id"]: r["score_micro"]
        for r in propagate_scores(edges, seeds, iters=1).collect()
    }
    assert one == {1: 175, 2: 150, 3: 350, 4: 200, 5: 50, 6: 500}
    two = {
        r["id"]: r["score_micro"]
        for r in propagate_scores(edges, seeds, iters=2).collect()
    }
    assert two == {1: 175, 2: 187, 3: 250, 4: 225, 5: 87, 6: 500}


def test_propagate_scores_validation(spark):
    from mysql_syncer_spark.operators.similarity import propagate_scores

    edges = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
    seeds = spark.createDataFrame([(1, 10)], "id LONG, score_micro LONG")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="iters"):
        propagate_scores(edges, seeds, iters=0)
    with _pytest.raises(ValueError, match="alpha"):
        propagate_scores(edges, seeds, alpha_num=3, alpha_den=2)
