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
        # r5: ann_topk_ivf / approx_distinct_users_events moved OUT of the
        # window (approximate → err:"no_oracle" forever; pytest-gated
        # instead) in favor of exactly-provable rows.
        "curate_corpus_docs",
        "contamination_docs", "cdc_apply_orders",
        "pii_docs", "pack_sequences_docs", "tfidf_topk_docs",
        "label_centroids_embeddings",
        "cluster_safe_split_docs",
        # r7 rotation: incremental_new_docs OUT (the in-window indexed
        # variant computes the IDENTICAL output through the persisted
        # index — same oracle SQL)
        # r5 additions
        "incremental_new_docs_indexed", "scd2_multibatch_orders",
        # r9 rotation OUT (justifications at _DEMOTED in queries.py):
        # json_extract_events, salted_join_orders_customer,
        # repetition_docs, quota_sample_docs, supplier_revenue,
        # priority_sample_docs, minhash_pairs_between_docs,
        # profile_orders, chunk_docs, shard_stats_docs,
        # gap_fill_daily_events, row_hash_orders, dedup_exact_docs,
        # embedding_near_dup_pairs, ann_topk_batch — all remain
        # oracle-backed, 3-SF parity-swept, in the sf1 VALUE sweep,
        # and driver-green in earlier rounds' windows.
        "mixture_sample_docs", "semantic_dedup_embeddings",
        "dedup_keep_best_docs",
        # r5 third wave: Gopher rules displaced hourly_event_counts;
        # r8 second wave rotated gopher_quality_docs itself OUT (its
        # rule set runs end-to-end in-window via curate_corpus_docs).
        # r7 rotation in (the _PROMOTED front): the three operators
        # that landed after the r6 sweeps + the hardest new TPC-H +
        # the E120 propagation stage
        "asof_forward_events_orders", "entity_clusters_part",
        "scrub_repeated_windows_docs", "tpch_q9_product_type_profit",
        "quality_propagate_embeddings",
        # r5: the CCNet-style unigram LM score displaced rows_to_copy;
        # r8 second wave rotated unigram_logprob_docs itself OUT (the
        # hashed-LM kernel stays in-window via dsir_sample_docs).
        # r7 second wave: three NEW operator classes promoted into the
        # window (IVM join maintenance, DSIR resampling, containment
        # dedup), displacing quantize_embeddings /
        # incremental_agg_orders / winsorize_events_value — all three
        # remain oracle-backed, 3-SF parity-swept, and bench-keyed;
        # justifications at the _PROMOTED comment in queries.py.
        "ivm_join_orders_customer",
        "dsir_sample_docs",
        "containment_pairs_docs",
        # r8 rotation: the never-window r7 fourth wave (new operator
        # classes the driver had not certified) + the round-8
        # left-outer IVM. Displaced (interval_join, jl_project,
        # cube_pricing, funnel, cohort_retention, sliding_window) all
        # remain oracle-backed, 3-SF parity-swept, AND in the sf1
        # VALUE sweep; justifications at _PROMOTED in queries.py.
        "ivm_left_join_orders_customer",
        "benford_screen_events",
        "mwu_drift_events",
        "theil_sen_trend_events",
        "fd_audit_orders",
        "bitmap_distinct_users_events",
        # r8 second wave: two NEW operator classes (two-sided FULL-outer
        # IVM; t-closeness distribution-distance privacy), displacing
        # gopher_quality_docs / unigram_logprob_docs — justifications
        # at _PROMOTED in queries.py.
        "ivm_full_join_orders_customer",
        "t_closeness_customer",
        # r9 rotation IN: the never-window retirement wave — the
        # delete-maintainable IVM family, the r8 curation/privacy/
        # overlap additions, three TPC-H classics, and four analytics
        # kernels (justifications at _PROMOTED in queries.py).
        "ivm_extrema_orders", "ivm_frequent_orders",
        "ivm_distinct_orders", "golden_records_events",
        "token_budget_sample_docs", "bitmap_overlap_events",
        "t_closeness_ordered_customer", "tpch_q1_pricing",
        "tpch_q3_shipping_priority", "tpch_q10_returned_items",
        "group_quantiles_events", "ks_drift_events",
        "heavy_hitters_users_events", "k_anonymity_customer",
        "ewma_daily_events",
    }
    assert must_be_in <= window, sorted(must_be_in - window)
    from mysql_syncer_spark.queries import _DEMOTED

    assert set(names[50:]) <= set(_DEMOTED)
    oracle_names = [n for n in entrymod.oracle_sql()]
    assert oracle_names == [n for n in names if n in set(oracle_names)]
