"""sf1 VALUE parity (round 7): the DuckDB-oracle gate run at 10× the
bench fixture for the scale-sensitive oracle-backed queries.

BENCH_SCALE.md times sf1 but never value-checks it; float-drift and
overflow classes only appear at volume (the verify skill records a
cosine bug that passed at sf0.001/0.01 and failed only at sf0.1).
This harness synthesizes sf1 (bench_scale.synthesize_sf1 — key-shifted
replicas, replica-unique document text) and runs the SAME compare the
per-round parity sweep uses (sorted rows, floats at %.9g) for ~30
windows/drift/search/dedup/join queries. Results go to stdout as JSON
lines; the committed table lives in PARITY_SCALE.md.

The synthesized events table carries ts as BIGINT nanos (the Spark
writer session reads TIMESTAMP(NANOS) as long); the Spark side
converts via load_table, the DuckDB side via a make_timestamp view —
both to microseconds, identically.

Usage: python parity_scale.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scale import _session, synthesize_sf1

#: scale-sensitive oracle-backed queries (windows, drift, search,
#: dedup/similarity pairs, SCD2/CDC folds, the heavy TPC-H joins).
#: part/supplier-only queries are excluded — those dims are copied
#: unscaled by the synth.
SCALE_QUERIES = [
    "sync_merge_orders",
    "minhash_lsh_pairs_docs",
    "simhash_near_dup_docs",
    "simhash_clusters_docs",
    "dedup_keep_best_docs",
    "cluster_safe_split_docs",
    "scrub_repeated_spans_docs",
    "scrub_repeated_windows_docs",
    "interval_join_error_windows",
    "gap_fill_daily_events",
    "anomaly_zscore_events",
    "cms_term_counts_docs",
    "snapshot_cdc_orders",
    "event_transitions",
    "attribution_events",
    "session_paths_events",
    "image_near_dup_media",
    "scd2_lookup_lineitem",
    "scd2_multibatch_orders",
    "profile_drift_orders",
    "ks_drift_events",
    "psi_drift_events",
    "bm25_search_docs",
    "phrase_search_docs",
    "vocab_drift_docs",
    "sessionize_events",
    "sliding_window_counts_events",
    "winsorize_events_value",
    "group_quantiles_events",
    "asof_forward_events_orders",
    "tpch_q1_pricing",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "knn_graph_embeddings",
    "quality_propagate_embeddings",
    # round-7 second wave. customer-only k_anonymity is excluded (the
    # synth copies dims unscaled); assoc/triangles are included for
    # regression value even though their outputs are sf0.1-identical
    # by construction (distinct-basket / bounded-subgraph semantics).
    "heavy_hitters_users_events",
    "dsir_weights_docs",
    "dsir_sample_docs",     # Gumbel-top-k boundary at 50k docs: the
                            # float-rank-gap claim tested at volume
    "ivm_join_orders_customer",
    "containment_pairs_docs",
    "assoc_rules_events",
    "corr_matrix_events",
    "trend_events",
    "ewma_daily_events",
    "knn_triangles_embeddings",
    # round-7 third wave. customer-only l_diversity is excluded like
    # k_anonymity (dims copied unscaled); everything else exercises a
    # scale-sensitive surface at 10×: the quantile sketch's exactness
    # law across 32 partition folds, RRF's float fold over shifted
    # corpus stats, the prefix filter's losslessness at a 10× posting
    # universe, MAD's discrete medians at 100k rows/group, PMI counts.
    "quantile_sketch_lineitem",
    "hybrid_search_docs",
    "jaccard_prefix_pairs_docs",
    "mad_outliers_events",
    "pmi_collocations_docs",
    # round-7 fourth wave. fd_audit/l_diversity are customer/orders
    # dims... fd_audit runs on orders (scaled) — included; benford and
    # bitmap scale with events; pagerank is the fixed 500-node exact
    # subgraph (sf-invariant by construction, included for regression
    # value like quality_propagate).
    "bitmap_distinct_users_events",
    "pagerank_embeddings",
    "fd_audit_orders",
    "benford_screen_events",
    "theil_sen_trend_events",
    "entropy_mix_events",
    "prop_ztest_events",
    # round-8 widening: EVERY remaining oracle-backed registry query.
    # Dim-only queries (part/supplier/customer copied unscaled by the
    # synth: entity_clusters_part, fuzzy_name_pairs_part,
    # k_anonymity_customer, l_diversity_customer, frame_sample_part,
    # supplier_revenue over unscaled supplier dim...) are INCLUDED for
    # regression value with that caveat — their values equal sf0.1 by
    # construction, but the harness still proves the plan runs and the
    # oracle agrees at the sf1 session/config. Ordered fast-first so a
    # straggler at the tail can be triaged without losing the sweep.
    # -- sync-core family (the reference surface itself at 10x) --
    "table_digest_orders",
    "row_hash_orders",
    "partition_digests_orders",
    "distinct_partitions_orders",
    "differing_partitions_orders",
    "missing_rows_orders",
    "excess_rows_orders",
    "changed_rows_orders",
    "rows_to_copy_orders",
    "pk_projection_orders",
    "count_lineitem",
    "filter_eq_orders",
    "point_filter_lineitem",
    "scd2_orders",
    "cdc_apply_orders",
    "incremental_agg_orders",
    "tpch_q1_incremental",
    # -- TPC-H completion (all 22 at sf1; q1/q8/q9 in wave 1) --
    "agg_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q3_colocated",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "revenue_by_nation",
    "supplier_revenue",
    "rollup_revenue",
    "cube_pricing_summary",
    "ivm_left_join_orders_customer",  # E149 (r8): left-outer IVM
    # -- relational / events family --
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "salted_join_orders_customer",
    "topk_per_group",
    "latest_event_per_user",
    "running_total_events",
    "hourly_event_counts",
    "distinct_users_per_type",
    "pivot_event_counts",
    "unpivot_event_counts",
    "json_extract_events",
    "range_join_user_bursts",
    "asof_join_events_orders",
    "funnel_events",
    "cohort_retention_events",
    "mwu_drift_events",
    # -- profiling / privacy / integrity --
    "profile_orders",
    "integrity_check_orders",
    "k_anonymity_customer",
    "l_diversity_customer",
    # -- docs text family --
    "dedup_exact_docs",
    "lang_id_docs",
    "quality_docs",
    "gopher_quality_docs",
    "token_counts_docs",
    "token_quantiles_docs",
    "fingerprints_docs",
    "simhash_docs",
    "unigram_logprob_docs",
    "bigram_logprob_docs",
    "repetition_docs",
    "pii_docs",
    "contamination_docs",
    "tfidf_topk_docs",
    "chunk_docs",
    "curate_corpus_docs",
    # -- sampling / packing / sharding --
    "hash_sample_docs",
    "hash_split_docs",
    "stratified_sample_docs",
    "quota_sample_docs",
    "mixture_sample_docs",
    "replicate_mixture_docs",
    "priority_sample_docs",
    "epoch_shuffle_docs",
    "pack_sequences_docs",
    "shard_stats_docs",
    # -- embeddings / similarity / media (heaviest last) --
    "sign_buckets_embeddings",
    "quantize_embeddings",
    "jl_project_embeddings",
    "label_centroids_embeddings",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_batch",
    "embedding_near_dup_pairs",
    "semantic_dedup_embeddings",
    "ngram_jaccard_pairs_docs",
    "incremental_new_docs",
    "incremental_new_docs_indexed",
    "bloom_new_docs_gate",
    "minhash_pairs_between_docs",
    "incremental_ingest_2pct",
    "incremental_ingest_2pct_indexed",
    "entity_clusters_part",
    "fuzzy_name_pairs_part",
    "frame_sample_part",
    "media_features_docs",
    "resize_media_docs",
    "audio_features_docs",
    # round-8 second wave (E151-E154)
    "ivm_full_join_orders_customer",
    "ivm_extrema_orders",
    "t_closeness_customer",
    "t_closeness_ordered_customer",
    "ivm_frequent_orders",
    "golden_records_events",
    "token_budget_sample_docs",
    "bitmap_overlap_events",
    "ivm_distinct_orders",
    "ewma_chunked_daily_events",
    "duplicate_spans_docs",
    "curation_funnel_docs",
    "temperature_mixture_docs",
    "duplication_profile_docs",
    "unimax_sample_docs",
    "decontaminate_spans_docs",
    "unimax_tokens_docs",
    "exact_ntile_events",
    "exact_ntile_by_type_events",
    # round-10 additions: the four r10 operators — the KN LM's
    # type-count ratios at a 10x bigram-type universe, the sorted-
    # export NTILE decomposition at 10x value cardinality, the bitext
    # margins over the 10x embedding split, and the randomization
    # test's exact-decimal-mean law at volume.
    "kn_bigram_logprob_docs",
    "sorted_export_manifest_docs",
    "bitext_mine_embeddings",
    "randomization_test_events",
    "dp_event_type_counts",
    # r11: rows-only sf1 rows (PCA eigensolve; LSH-probed bitext) +
    # the two queries whose oracle/seed changed in r11
    "pca_whiten_embeddings",
    "bitext_mine_embeddings_lsh",
    # r12 (VERDICT r11 item 3): the r11 six at 10x — the A-ES rank
    # boundary over a 500 k-doc weight domain (global + stratified),
    # the bootstrap's 32-replicate relabeling over 1 M events, the
    # corpus card + its 3-batch fold≡recompute law at a 500 k-doc
    # hash table, and source_overlap's shingle fan-out at 10x text
    # volume — plus the E184 stratified-vs-global agreement law.
    "weighted_sample_docs",
    "weighted_sample_by_lang_docs",
    "bootstrap_mean_ci_events",
    "corpus_card_docs",
    "corpus_card_incremental_docs",
    "source_overlap_docs",
    "stratified_consistency_docs",
    # r12 second wave: the χ²'s DECIMAL-squared cells over 10x event
    # volume, the κ/Gini integer closed forms at 10x marginals, and
    # the TTR countDistincts over a 10x gram universe.
    "chi2_independence_events",
    "source_concentration_docs",
    "langid_kappa_docs",
    "ngram_diversity_docs",
    # r12 third wave: JSD/entropy fixed-order log sums at 10x counts,
    # the Zipf regr head over a 10x vocabulary.
    "js_weekend_drift_events",
    "transition_entropy_events",
    "zipf_fit_docs",
    # r12 fourth wave: the k-fold balance law over 10x strata and the
    # KM running product over a 10x duration grain.
    "stratified_kfold_docs",
    "km_retention_events",
]


def _canon_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry

    spark = _session()
    sf1 = synthesize_sf1(spark)

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf1}/{t}.parquet/*.parquet'"
        )
    # events: ts is BIGINT nanos in the synthesized copy — convert to
    # microsecond timestamps exactly as load_table does Spark-side
    desc = con.execute(
        f"DESCRIBE SELECT * FROM '{sf1}/events.parquet/*.parquet'"
    ).fetchall()
    kinds = {d[0]: d[1] for d in desc}
    if kinds.get("ts") == "BIGINT":
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM "
            f"'{sf1}/events.parquet/*.parquet'"
        )
    else:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf1}/events.parquet/*.parquet'"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    only = set(sys.argv[1:])
    names = [q for q in SCALE_QUERIES if not only or q in only]
    failures = 0
    for name in names:
        t0 = time.time()
        rec = {"query": name}
        try:
            sdf = qs[name](spark, sf1)
            if name not in osql:
                # rows-only at sf1 too (no SQL form — IVF/PQ/PCA/LSH
                # class); the value gates are the named pytest laws
                rec["spark_rows"] = sdf.count()
                rec["ok"] = rec["spark_rows"] > 0
                rec["note"] = "rows_only"
                rec["seconds"] = round(time.time() - t0, 2)
                failures += not rec["ok"]
                print(json.dumps(rec), flush=True)
                continue
            scols = list(sdf.columns)
            srows = [[row[c] for c in scols] for row in sdf.collect()]
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["spark_rows"] = len(srows)
            rec["oracle_rows"] = len(orows)
            rec["cols_match"] = sorted(scols) == sorted(ocols)
            rec["values_match"] = _canon_rows(scols, srows) == _canon_rows(
                ocols, orows
            )
            rec["ok"] = bool(
                rec["cols_match"]
                and rec["values_match"]
                and len(srows) == len(orows)
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            rec["ok"] = False
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        rec["seconds"] = round(time.time() - t0, 2)
        failures += not rec.get("ok")
        print(json.dumps(rec), flush=True)
    print(
        json.dumps({"total": len(names), "failures": failures}), flush=True
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
