"""Driver-style oracle parity: run every queries() entry on Spark AND
its oracle_sql() on DuckDB over the same parquet, compare row count +
column names + order-insensitive values — the same gate the driver
applies at sf0.01 (run here at sf0.001 for speed; override with
SPARK_GRAFT_TEST_SF_DIR)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon_cell(r[i]) for i in order) for r in rows
    )


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        assert len(srows) >= 0  # rows-only check (driver's weak mode)
        return
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    )
    sc = _canon_rows(scols, [[r[c] for c in scols] for r in srows])
    oc = _canon_rows(ocols, orows)
    mismatches = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first: "
        f"{sc[mismatches[0]]} vs {oc[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 6


def test_driver_window_holds_extension_queries():
    """The external harness oracle-checks only the FIRST 50 entries of
    queries(). Pin the ordering contract: every extension operator that
    round 3 found never-driver-checked (plus the ingest-gate composite)
    must sit inside the window, only deliberately demoted trivial rows
    outside it, and queries()/oracle_sql() must agree on the order."""
    names = list(entrymod.queries().keys())
    window = set(names[:50])
    must_be_in = {
        # r13 window (ROTATION.md): the pinned core-sync composites,
        # the surviving r9/r10/r12 promoted rows, and the r13
        # never-window retirement wave (the r6-r7 multimodal/graph/
        # stats/search rows, oldest first from the queue). Rotated
        # out: the whole r11 TPC-H block, re-certified full-green in
        # the r12 window (CORRECTNESS_r12).
        # pinned core composites
        "sync_merge_orders", "partition_digests_orders",
        # surviving r9 wave
        "tpch_q10_returned_items",
        "group_quantiles_events", "ks_drift_events",
        "heavy_hitters_users_events", "k_anonymity_customer",
        "ewma_daily_events",
        # r10 wave (oracle-backed survivors)
        "incremental_ingest_2pct", "incremental_ingest_2pct_indexed",
        "bigram_logprob_docs", "epoch_shuffle_docs",
        "bloom_new_docs_gate",
        "tpch_q5_local_supplier", "tpch_q6_forecast_revenue",
        "tpch_q14_promo_revenue", "tpch_q18_large_volume",
        "vocab_drift_docs", "bm25_search_docs", "phrase_search_docs",
        # r12 never-window retirement wave
        "cms_term_counts_docs", "stratified_sample_docs",
        "replicate_mixture_docs", "snapshot_cdc_orders",
        "integrity_check_orders", "psi_drift_events",
        "fuzzy_name_pairs_part", "tpch_q1_incremental",
        "tpch_q3_colocated", "profile_drift_orders",
        "pivot_event_counts", "scd2_lookup_lineitem",
        "event_transitions", "attribution_events",
        "unpivot_event_counts",
        # r13 never-window retirement wave
        "image_near_dup_media", "session_paths_events",
        "knn_graph_embeddings", "dsir_weights_docs",
        "knn_triangles_embeddings", "assoc_rules_events",
        "corr_matrix_events", "trend_events",
        "l_diversity_customer", "quantile_sketch_lineitem",
        "hybrid_search_docs", "jaccard_prefix_pairs_docs",
        "mad_outliers_events", "pmi_collocations_docs",
        "pagerank_embeddings",
    }
    # the r11 policy invariant: every window row is oracle-backed
    assert window <= set(entrymod.oracle_sql()), sorted(
        window - set(entrymod.oracle_sql())
    )
    assert must_be_in <= window, sorted(must_be_in - window)
    from mysql_syncer_spark.queries import _DEMOTED

    assert set(names[50:]) <= set(_DEMOTED)
    oracle_names = [n for n in entrymod.oracle_sql()]
    assert oracle_names == [n for n in names if n in set(oracle_names)]
