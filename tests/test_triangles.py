"""Triangle counting / clustering coefficient (cluster.py): gates are
hand-computed graphs (clique, path, wheel), canonicalization laws
(direction/duplicate/self-loop immunity), and the orientation-
independence the oracle relies on."""

import pytest

from mysql_syncer_spark.operators.cluster import (
    canonical_edges,
    clustering_coefficients,
    triangle_counts,
)


def _coeffs(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: (r["degree"], r["triangles"], round(r["clustering_coeff"], 6))
        for r in clustering_coefficients(df).collect()
    }


def test_k4_plus_path(spark):
    out = _coeffs(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7)],
    )
    for n in (1, 2, 3, 4):  # clique: every node in all 3 triangles
        assert out[n] == (3, 3, 1.0)
    assert out[6] == (2, 0, 0.0)  # path center: wedge, no closure
    assert out[5] == (1, 0, 0.0)  # degree-1: coefficient defined as 0


def test_wheel_hub_vs_rim(spark):
    # hub 0 over the 4-cycle 10-11-12-13: hub sits in 4 triangles,
    # every rim node in 2 of 3 possible
    out = _coeffs(
        spark,
        [(0, 10), (0, 11), (0, 12), (0, 13),
         (10, 11), (11, 12), (12, 13), (10, 13)],
    )
    assert out[0] == (4, 4, pytest.approx(4 / 6, abs=1e-6))
    for n in (10, 11, 12, 13):
        assert out[n] == (3, 2, pytest.approx(2 / 3, abs=1e-6))


def test_canonicalization_immunity(spark):
    # reversed duplicates, exact duplicates, and self-loops change
    # nothing: the triangle answer is a function of the simple graph
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 2), (1, 1), (3, 3)]
    assert _coeffs(spark, base) == _coeffs(spark, noisy)
    ce = canonical_edges(
        spark.createDataFrame(noisy, "id_a long, id_b long")
    ).collect()
    assert sorted((r["a"], r["b"]) for r in ce) == [(1, 2), (1, 3), (2, 3)]


def test_triangle_free_graph_all_zero(spark):
    # bipartite C6 cycle: plenty of wedges, zero triangles
    out = _coeffs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)])
    assert all(v == (2, 0, 0.0) for v in out.values())


def test_string_node_ids(spark):
    # the operator is id-type generic (entity graphs use names)
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "id_a string, id_b string"
    )
    out = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}
