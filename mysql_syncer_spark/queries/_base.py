"""Query registry: every operator from SURVEY.md §2 (+ phase-E
extensions) as a (Spark callable, DuckDB oracle SQL) pair.

Contract (driver): each callable takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle SQL runs on DuckDB views named after the fixture
tables. The driver compares row count + schema + order-insensitive
value hash, with columns sorted by name — so every computed column is
aliased identically on both sides.

Cross-engine determinism rules used throughout (validated empirically):

* md5 / concat_ws are bit-identical across engines; all content hashes
  derive from them (canon.py).
* money aggregates go through exact DECIMAL sums (order-independent,
  engine-independent), then cast to DOUBLE for a stable final schema —
  the decimal→double conversion is the same IEEE value on both sides.
* float-valued similarity scores are round()ed to 6 decimals (raw
  doubles differ in the last ulps because summation order differs).
* timestamps are compared as-is (micros precision on both sides;
  events' nanos column is truncated to micros on load — catalog.py).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from mysql_syncer_spark.canon import (
    HASH_COL,
    duckdb_row_hash_expr,
    row_hash_col,
    with_row_hash,
)
from mysql_syncer_spark.diff import (
    changed_rows,
    excess_rows,
    merge_tables,
    missing_rows,
    rows_to_copy,
)
from mysql_syncer_spark.operators import (
    dedup,
    packing,
    sampling,
    similarity,
    text,
)
from mysql_syncer_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# canonical column kinds per fixture table (for oracle hash expressions)
# ---------------------------------------------------------------------------

TABLE_KINDS: dict[str, list[tuple[str, str]]] = {
    "orders": [
        ("o_orderkey", "other"), ("o_custkey", "other"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"), ("o_orderpriority", "string"),
    ],
    "customer": [
        ("c_custkey", "other"), ("c_name", "string"),
        ("c_nationkey", "other"), ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "other"), ("l_partkey", "other"),
        ("l_suppkey", "other"), ("l_linenumber", "other"),
        ("l_quantity", "double"), ("l_extendedprice", "double"),
        ("l_discount", "double"), ("l_tax", "double"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
}

ORDERS_COLS = [c for c, _ in TABLE_KINDS["orders"]]

#: deterministic "slave" perturbation of orders used by the diff-kernel
#: queries: drop every 97th key, bump price on every 89th key. The same
#: definition exists in SQL below so both engines diff the same pair.
def _slave_orders(orders: DataFrame) -> DataFrame:
    key = F.col("o_orderkey")
    return orders.where(key % 97 != 0).withColumn(
        "o_totalprice",
        F.when(key % 89 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )


_SLAVE_ORDERS_SQL = """
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
"""

_ORDERS_HASH = duckdb_row_hash_expr(TABLE_KINDS["orders"])
_LINEITEM_HASH = duckdb_row_hash_expr(TABLE_KINDS["lineitem"])

#: DuckDB mirror of digest._sum_hash_col (60-bit md5 prefix, exact sum)
def _duck_hash_sum(h: str = "h") -> str:
    return f"SUM(('0x' || substr({h}, 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


#: Round-7 window rotation (the standing discipline: rotate the
#: longest-out-of-window oracle-backed queries into the driver's 50-row
#: window each round, displacing rows whose machinery an in-window
#: composite already embeds). _PROMOTED entries are pulled to the FRONT
#: of queries() regardless of registration order.
#:
#: r7 in: asof_forward (E118 generalized as-of — same operator as the
#: displaced backward asof, plus forward+tolerance), entity_clusters
#: (E117 — fuzzy pairs + CC fold), scrub_repeated_windows (shift-robust
#: scrub — STRICTER than the displaced tiled sibling), tpch_q9 (derived
#: partsupp join, the hardest new TPC-H), quality_propagate (E120).
#: r7 out (all embedded by in-window composites, justifications at
#: their _DEMOTED entries): asof_join_events_orders,
#: simhash_near_dup_docs, simhash_clusters_docs,
#: scrub_repeated_spans_docs, incremental_new_docs.
_PROMOTED: tuple[str, ...] = (
    # r7 second wave: three NEW operator classes promoted so the
    # driver window certifies them in CORRECTNESS_r07. Displaced (to
    # positions 51-53, all still oracle-backed + parity-swept at 3
    # SFs + bench-keyed): quantize_embeddings (row-local vector
    # codegen — in-window representative jl_project_embeddings, the
    # same per-row vector kernel class), incremental_agg_orders (the
    # monoid delta fold — the promoted IVM row runs the same
    # keyed-delta discipline on the harder join shape, and in-window
    # scd2_multibatch exercises fold-over-batches), winsorize_events_
    # value (a one-expression clamp atop the exact-percentile kernel
    # that token_quantiles/group_quantiles keep parity-swept; the
    # least-severe remaining displacement).
    # r8 rotation: the never-window r7 fourth wave (each a NEW operator
    # class the driver had never certified) plus the round-8 left-outer
    # IVM (E149). Displaced to positions 51-56 (all still oracle-backed,
    # parity-swept at 3 SFs, and in the sf1 VALUE sweep):
    # interval_join_error_windows, jl_project_embeddings,
    # cube_pricing_summary, funnel_events, cohort_retention_events,
    # sliding_window_counts_events — every one a composite whose
    # kernels (range join, per-row vector codegen, grouping sets,
    # ordered-sequence window, cohort bucketing, sliding window) other
    # in-window rows or the sf1 sweep keep machine-checked.
    # r12 rotation: the r8 block (mwu_drift_events,
    # theil_sen_trend_events, fd_audit_orders,
    # bitmap_distinct_users_events, ivm_full_join_orders_customer,
    # t_closeness_customer) and the first nine r9 rows rotated OUT —
    # all fifteen full-green in CORRECTNESS_r11 (cumulative coverage
    # kept per ROTATION.md); justifications at their _DEMOTED entries.
    # r9 rotation (the standing never-window retirement, VERDICT r8
    # item 2): FIFTEEN oracle-backed queries the driver had never
    # certified rotate IN — the whole r8 second wave of
    # delete-maintainable state (extrema/frequent/distinct IVM), the
    # r8 curation/privacy/exact-overlap additions, the three
    # longest-never-window TPC-H classics, and four analytics kernels
    # (exact grouped quantiles, KS drift, MG heavy hitters,
    # k-anonymity, EWMA). Displacements at the r9 _DEMOTED block —
    # every one remains oracle-backed, 3-SF parity-swept, in the sf1
    # VALUE sweep, and driver-green in an earlier round's window
    # (cumulative coverage is never lost; the ledger is ROTATION.md).
    # r12: the first nine r9 rows (ivm_extrema/frequent/distinct,
    # golden_records, token_budget_sample, bitmap_overlap,
    # t_closeness_ordered, tpch_q1_pricing, tpch_q3_shipping_priority)
    # rotated OUT — all driver-green r9 AND re-certified green in the
    # r11 window; _DEMOTED entries carry the justifications.
    "tpch_q10_returned_items",
    "group_quantiles_events",
    "ks_drift_events",
    "heavy_hitters_users_events",
    "k_anonymity_customer",
    "ewma_daily_events",
    # r10 rotation (VERDICT r9 item 2): SEVENTEEN never-window queries
    # rotate in, oldest-first from the ROTATION.md queue — the r5/r6
    # ANN index/PQ rows (rows-only by nature: float k-means chains;
    # their exact gates are the pytest recall tests, and the driver
    # records the honest rows-only check), the 98/2 incremental-ingest
    # pair (recompute + persisted-index paths of the same gate), the
    # bloom pre-gate, the LM extensions (bigram logprob, BPE tokens),
    # epoch shuffle, the model-based quality scorer (rows-only), four
    # TPC-H classics (Q5/Q6/Q14/Q18), vocab drift, real-GIF frame
    # sampling (rows-only codec path, bit-exact pytest), and the two
    # retrieval rows (BM25, positional phrase search). Two core-sync
    # composites are PINNED alongside (sync_merge_orders,
    # partition_digests_orders — previously in-window by registration
    # order) so the reference's diff/digest kernels stay
    # driver-certified every round. Displaced to positions 51+ (all
    # driver-green in r9 or earlier, oracle-backed, 3-SF parity-swept;
    # cumulative coverage kept per ROTATION.md): sessionize_events,
    # minhash_lsh_pairs_docs, resize_media_docs, audio_features_docs,
    # curate_corpus_docs, contamination_docs, cdc_apply_orders,
    # scd2_multibatch_orders, pii_docs, pack_sequences_docs,
    # tfidf_topk_docs, label_centroids_embeddings,
    # cluster_safe_split_docs, incremental_new_docs_indexed,
    # mixture_sample_docs, semantic_dedup_embeddings,
    # dedup_keep_best_docs.
    "sync_merge_orders",
    "partition_digests_orders",
    "incremental_ingest_2pct",
    "incremental_ingest_2pct_indexed",
    "bigram_logprob_docs",
    "epoch_shuffle_docs",
    "bloom_new_docs_gate",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume",
    "vocab_drift_docs",
    "bm25_search_docs",
    "phrase_search_docs",
    # r11 rotation (VERDICT r10 items 1+2 / window policy): the five
    # rows-only entries the r10 window spent slots on (ann_topk_ivf_
    # indexed, ann_topk_pq, bpe_tokens_docs, quality_score_docs,
    # frame_sample_media_docs — the driver can only record rows>0 for
    # them; their real gates are the named pytest recall/bit-exactness
    # tests) move PAST the window permanently, per the ROTATION.md
    # policy: window slots go exclusively to oracle-backed queries.
    # Ten oldest driver-green r7/r8 rows also rotate out (asof_forward,
    # entity_clusters, scrub_repeated_windows, tpch_q9,
    # quality_propagate, ivm_join, dsir_sample, containment_pairs,
    # ivm_left_join, benford_screen — every one full-green in
    # CORRECTNESS_r10; cumulative coverage kept per ROTATION.md).
    # FIFTEEN oracle-backed never-window queries rotate in, oldest
    # first from the queue: the remaining TPC-H classics and the
    # z-score anomaly screen.
    # r13 rotation (ROTATION.md policy §3): FIFTEEN oracle-backed
    # never-window queries rotate in, oldest-first from the queue —
    # the r6-r7 multimodal/graph/stats/search rows the window had
    # never certified. Displaced: the whole r11 TPC-H block
    # (tpch_q4/q7/q8/q13/q15/q16/q17/q19/q21/q22/q2/q11/q12/q20 +
    # anomaly_zscore_events) — every one driver-green TWICE
    # (first-certified r11, re-certified full-green in the r12
    # window); justifications at their _DEMOTED entries.
    "image_near_dup_media",
    "session_paths_events",
    "knn_graph_embeddings",
    "dsir_weights_docs",
    "knn_triangles_embeddings",
    "assoc_rules_events",
    "corr_matrix_events",
    "trend_events",
    "l_diversity_customer",
    "quantile_sketch_lineitem",
    "hybrid_search_docs",
    "jaccard_prefix_pairs_docs",
    "mad_outliers_events",
    "pmi_collocations_docs",
    "pagerank_embeddings",
    # r12 rotation (VERDICT r11 item 2): FIFTEEN oracle-backed
    # never-window queries rotate in, oldest-first from the ROTATION.md
    # queue — the r4-r7 analytics/curation rows the window had never
    # certified. cluster_balanced_sample_embeddings (next in queue age
    # order) is rows-only (k-means float chain; its gate is the pytest
    # balance/recall law) and is EXCLUDED per the window policy —
    # unpivot_event_counts takes its slot. Displaced: the r8 block and
    # the first nine r9 rows (all re-certified green in the r11
    # window; see the r12 comment above and ROTATION.md).
    "cms_term_counts_docs",
    "stratified_sample_docs",
    "replicate_mixture_docs",
    "snapshot_cdc_orders",
    "integrity_check_orders",
    "psi_drift_events",
    "fuzzy_name_pairs_part",
    "tpch_q1_incremental",
    "tpch_q3_colocated",
    "profile_drift_orders",
    "pivot_event_counts",
    "scd2_lookup_lineitem",
    "event_transitions",
    "attribution_events",
    "unpivot_event_counts",
)

#: Queries proven green across rounds 1-3 whose machinery is fully covered
#: by other in-window rows (each is a one-expression projection/filter over
#: an operator that a harder checked query also exercises). The driver
#: oracle-checks only the FIRST 50 entries of ``queries()``, so these are
#: ordered last to make room for the extension operators (SCD2, CDC merge,
#: TF-IDF, PII, contamination, packing, sampling, centroids, bipartite
#: MinHash, ...) that had never received a driver correctness row. They all
#: remain registered and remain covered by tests/test_oracle_parity.py.
_DEMOTED: tuple[str, ...] = (
    # r13 rotation out of the window — the whole r11 TPC-H block.
    # Every one is driver-green TWICE over (first-certified in the r11
    # window, re-certified full-green in the r12 window,
    # CORRECTNESS_r12), oracle-backed, 3-SF parity-swept, and
    # bench-keyed; the TPC-H agg/join shapes stay machine-checked
    # in-window via tpch_q10 (r9 block), tpch_q5/q6/q14/q18 (r10
    # block) and tpch_q1_incremental/tpch_q3_colocated (r12 block).
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q20_potential_promotion",
    "anomaly_zscore_events",
    # r12 rotation out of the window — the r8 block and the first nine
    # r9 rows. Every one is driver-green TWICE over (first-certified in
    # its own round's window AND re-certified full-green in the r11
    # window, CORRECTNESS_r11), oracle-backed, 3-SF parity-swept, and
    # bench-keyed; their kernels stay machine-checked in-window: the
    # keyed-delta IVM discipline via the incremental-ingest pair and
    # snapshot_cdc/tpch_q1_incremental (now IN window), the rank/window
    # family via group_quantiles + ks_drift (still in window via r9
    # tail rows), the privacy distribution-distance pair via
    # k_anonymity_customer (in window), and the TPC-H agg shapes via
    # the fourteen TPC-H rows still in window.
    "mwu_drift_events",
    "theil_sen_trend_events",
    "fd_audit_orders",
    "bitmap_distinct_users_events",
    "ivm_full_join_orders_customer",
    "t_closeness_customer",
    "ivm_extrema_orders",
    "ivm_frequent_orders",
    "ivm_distinct_orders",
    "golden_records_events",
    "token_budget_sample_docs",
    "bitmap_overlap_events",
    "t_closeness_ordered_customer",
    "tpch_q1_pricing",
    "tpch_q3_shipping_priority",
    # r10 rotation out of the window — all seventeen remain
    # oracle-backed, 3-SF parity-swept, bench-keyed where applicable,
    # and driver-green in r9 or earlier windows (ROTATION.md keeps the
    # cumulative ledger). Displaced for the r10 never-window retirement
    # wave (_PROMOTED r10 block): the kernels stay machine-checked —
    # sessionize/window shapes via the asof/interval family in parity,
    # the LSH/banding kernels via the incremental-ingest pair now IN
    # window, the media Arrow path via frame_sample_media_docs now IN
    # window, the curation composites via the rule-funnel and sampling
    # rows in parity, and every one still runs in the committed sweeps.
    "sessionize_events",
    "minhash_lsh_pairs_docs",
    "resize_media_docs",
    "audio_features_docs",
    "curate_corpus_docs",
    "contamination_docs",
    "cdc_apply_orders",
    "scd2_multibatch_orders",
    "pii_docs",
    "pack_sequences_docs",
    "tfidf_topk_docs",
    "label_centroids_embeddings",
    "cluster_safe_split_docs",
    "incremental_new_docs_indexed",
    "mixture_sample_docs",
    "semantic_dedup_embeddings",
    "dedup_keep_best_docs",
    # r8 rotation out of the window — all six remain oracle-backed,
    # 3-SF parity-swept, and in the sf1 VALUE sweep; displaced for the
    # r7 fourth-wave stats classes + left-outer IVM (_PROMOTED):
    # range-join kernel also exercised by range_join_user_bursts
    # (parity) and the as-of family in-window.
    "interval_join_error_windows",
    # per-row vector codegen class shared with in-window
    # label_centroids_embeddings and the ANN re-rank stages.
    "jl_project_embeddings",
    # grouping-sets cells are a superset of agg_pricing_summary's
    # (parity-swept); decimal-sum agg in-window via supplier_revenue.
    "cube_pricing_summary",
    # ordered-sequence window kernel in-window via sessionize_events;
    # funnel itself stays in the sf1 VALUE sweep.
    "funnel_events",
    # cohort bucketing = groupBy over derived keys, in-window via
    # gap_fill_daily_events' bucket agg; sf1-swept.
    "cohort_retention_events",
    # hopping-window agg subsumed by gap_fill_daily_events in-window;
    # sf1-swept.
    "sliding_window_counts_events",
    # r7 rotation out of the window — every one remains oracle-backed
    # and parity-swept; the justification is per-row:
    # backward as-of: the SAME timeseries.asof_join operator is
    # in-window via the promoted forward+tolerance variant (plus the
    # sessionize/gap-fill rows for the window-kernel shape).
    "asof_join_events_orders",
    # the SimHash near-dup banding and the CC pipeline are embedded by
    # the in-window cluster_safe_split_docs and dedup_keep_best_docs
    # composites (both run signature -> banding -> CC end-to-end).
    "simhash_near_dup_docs",
    "simhash_clusters_docs",
    # tiled C4 scrub: the promoted sliding-window scrub is the
    # STRICTER variant (catches the shifted copy the tiled scrub
    # provably misses, test_lines.py).
    "scrub_repeated_spans_docs",
    # recompute-path incremental gate: the in-window indexed variant
    # computes the IDENTICAL output (same oracle SQL) through the
    # persisted index — the shared gate kernel stays checked.
    "incremental_new_docs",
    # approximate by nature: can never hash-match a DuckDB oracle (the
    # driver records err:"no_oracle" forever). Their REAL gates are the
    # pytest recall / tolerance tests (test_similarity.py, test_sketches.py);
    # demoting them makes every driver-window row exactly provable.
    "ann_topk_ivf",
    "ann_topk_ivf_indexed",
    "ann_topk_pq",
    "approx_distinct_users_events",
    # r5: machinery fully covered by harder in-window rows — brute-force
    # top-k by ann_topk_batch/ann_topk_lsh (same dot-product + rank
    # kernel), distinct partition values by differing_partitions_orders
    # (same digest + set-diff pipeline). Green r2-r4.
    "ann_topk_bruteforce",
    "distinct_partitions_orders",
    # r5: cumulative-window machinery covered in-window by sessionize_
    # events / latest_event_per_user / topk_per_group. Green r2-r4.
    "running_total_events",
    # r5 second wave: elementary rows whose kernels are exercised by
    # harder in-window composites — sync_merge_orders runs the
    # missing/excess/changed anti-join trio end-to-end, rows_to_copy
    # the semi-join, topk_per_group the rank window, revenue_by_nation
    # + agg_pricing_summary the decimal-sum agg. All green r1-r4.
    # Demoted to admit the r5 extension operators (mixture, chunking,
    # SemDeDup, keep-best, shard manifest) into the checked window.
    "excess_rows_orders",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "rollup_revenue",
    "latest_event_per_user",
    # r5: sign-bucket + rank kernels covered in-window by ann_topk_batch
    # (two-stage bucketed rank) and the LSH blocking inside embedding
    # near-dup; LSH recall additionally pytest-gated (test_similarity).
    # Green r2-r4. Demoted to admit gap_fill_daily_events (E56).
    "ann_topk_lsh",
    # r5 third wave: admitted scrub_repeated_spans_docs (E57) +
    # gopher_quality_docs (E58). changed_rows is one leg of the diff
    # trio that sync_merge_orders runs end-to-end in-window (missing_
    # rows stays as the anti-join representative); hourly bucket counts
    # are a strict subset of gap_fill_daily_events' bucket agg. Both
    # green r1-r4.
    "changed_rows_orders",
    "hourly_event_counts",
    # r5 third wave, cont.: rows_to_copy is the J5 semi-join leg that
    # sync_merge_orders drives end-to-end in-window. Green r1-r4.
    # Demoted to admit unigram_logprob_docs (E59).
    "rows_to_copy_orders",
    # r5: differing_partitions' digest kernel is partition_digests_
    # orders (in-window) and its set-diff leg is sync_merge's anti-join
    # trio. Green r1-r4. Demoted to admit the equi-key-free interval
    # join (E62).
    "differing_partitions_orders",
    # r5: revenue_by_nation's join+agg machinery is covered in-window by
    # supplier_revenue (the star-schema broadcast form of the same
    # join) and agg_pricing_summary (the decimal-sum agg). Green r1-r4.
    # Demoted to admit jl_project_embeddings (E63).
    "revenue_by_nation",
    # r5: topk_per_group's rank-window kernel is in-window three ways
    # (tfidf_topk per-doc rank, quota_sample hash-rank, keep-best
    # cluster rank). Green r1-r4. Demoted to admit the CUBE grouping-
    # sets query (E64).
    "topk_per_group",
    # r5: missing_rows is the third leg of the diff trio that
    # sync_merge_orders (the full merge composite) runs end-to-end
    # in-window, same rationale its excess/changed siblings were
    # demoted under. Green r1-r4. Demoted to admit the ordered-funnel
    # operator (E66).
    "missing_rows_orders",
    # r5: the single-fold SCD2 row is a strict subset of the in-window
    # scd2_multibatch_orders (its bootstrap fold IS this query). Green
    # r2-r4. Demoted to admit cohort retention (E67).
    "scd2_orders",
    # r5: the whole-table digest kernel runs INSIDE in-window
    # digest_check_orders (both sides) and partition_digests_orders
    # (same canon hash + sort_array concat per partition). Green r1-r4.
    # Demoted to admit the hopping-window agg (E68).
    "table_digest_orders",
    # r5: the flat (returnflag, linestatus) aggregate is the base cell
    # set of in-window cube_pricing_summary (g_rf=0, g_ls=0 rows — same
    # sums, same groups). Green r1-r4. Demoted to admit int8
    # quantization (E70).
    "agg_pricing_summary",
    # r5: the exact-Jaccard baseline is the verification twin of
    # in-window minhash_lsh_pairs_docs (same shingle kernel; LSH recall
    # against it is pytest-gated in test_dedup). Green r1-r4. Demoted
    # to admit incremental rollup maintenance (E71).
    "ngram_jaccard_pairs_docs",
    # r5: winsorize runs the SAME exact-percentile kernel as token_
    # quantiles and adds the clamp on top — strict superset of its
    # machinery. Green r1-r4. Demoted to admit winsorization (E73).
    "token_quantiles_docs",
    # r5: TPC-H benchmark classics — registered, bench-keyed, and
    # exact-parity-tested at three SFs like every query, but the
    # 50-row driver window is fully allocated; their kernels
    # (pushed-filter agg, broadcast star joins, TakeOrdered) each have
    # an in-window representative (cube_pricing_summary,
    # supplier_revenue, priority_sample).
    "tpch_q1_pricing",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    # r5: drift monitor — window full; unigram-count + broadcast-totals
    # kernels represented in-window by unigram_logprob_docs; exact-
    # parity-tested at 3 SFs like every registered query.
    "vocab_drift_docs",
    # r5: real-GIF frame sampling — rows-only by nature (binary PNG
    # frames have no SQL form); the codec is bit-exactness-tested in
    # test_gif.py and the window holds only exactly-provable rows.
    "frame_sample_media_docs",
    # r5: BM25 retrieval — window full; tf/idf + broadcast-stats +
    # TakeOrdered kernels represented in-window by tfidf_topk_docs and
    # unigram_logprob_docs; exact-parity-tested at 3 SFs.
    "bm25_search_docs",
    # r5: phrase search — window full; positional-anchor kernel shares
    # the posting machinery of bm25/search rows; 3-SF parity.
    "phrase_search_docs",
    # r6: new registrations ordered BELOW the full 50-row window by
    # design (the window already holds only exactly-provable rows and
    # every kernel here has an in-window representative: the 98/2
    # ingest pair shares incremental_new_docs[_indexed]'s machinery,
    # the bloom gate's output ≡ the exact fp anti-join inside
    # incremental_new_docs, epoch-shuffle is the hash-rank window of
    # quota/priority sampling, bigram LM extends unigram_logprob).
    # All five are oracle-backed, in the committed sf0.01 parity sweep
    # (PARITY_r06.json), and 3-SF parity-tested.
    "incremental_ingest_2pct",
    "incremental_ingest_2pct_indexed",
    "bloom_new_docs_gate",
    "epoch_shuffle_docs",
    "bigram_logprob_docs",
    "bpe_tokens_docs",
    # r6 second wave: four more TPC-H classics (Q5/Q6/Q14/Q18) — same
    # rationale as the r5 trio: bench-keyed + 3-SF parity, kernels
    # represented in-window (star joins, pushed filters, TakeOrdered).
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume",
    # r6: grouped-quantile kernel represented in-window by
    # winsorize_events_value (same percentile agg) — oracle-backed,
    # parity-swept.
    "group_quantiles_events",
    # r6 third wave: TPC-H completion (the remaining spec queries
    # expressible on the trimmed fixture schema — adaptations named in
    # each docstring). Same placement rationale as the earlier TPC-H
    # waves: bench-keyed, oracle-backed, in the committed sf0.01 parity
    # sweep + 3-SF parity tests; kernels (semi/anti with cross-table
    # inequality, outer-join count histogram, scalar-max broadcast,
    # disjunctive pushdown, decorrelated avg) each have an in-window
    # representative.
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    # r6: rolling z-score anomaly (E89) — window-agg kernel represented
    # in-window by sessionize/latest-event windows; exact-decimal
    # construction parity-proven at 3 SFs incl. sf0.1.
    "anomaly_zscore_events",
    # r6: count-min sketch term counts (E90) — deterministic md5 hash
    # family lets the oracle mirror the construction cell-for-cell;
    # broadcast-probe kernel represented in-window by the bloom gate's
    # broadcast words join. 3-SF parity like every registered query.
    "cms_term_counts_docs",
    # r6: stratified per-stratum Bernoulli sample (E92) — zero-shuffle
    # hash-threshold kernel shared with in-window hash_split/quota rows.
    "stratified_sample_docs",
    # r6: cluster-balanced sample (E91) — rows-only by nature (k-means
    # float chain); pytest-gated like the IVF rows.
    "cluster_balanced_sample_embeddings",
    # r6: replication mixture (E94) — row-local explode kernel shared
    # with in-window chunk/pack rows; oracle-backed, parity-swept.
    "replicate_mixture_docs",
    # r6: snapshot-diff change capture (E95) — the full-outer hash-diff
    # kernel runs in-window inside sync_merge/scd2 rows; oracle-backed,
    # parity-swept.
    "snapshot_cdc_orders",
    # r6: integrity audit (E96) — anti-join + count kernels run
    # in-window inside sync_merge; oracle-backed, parity-swept.
    "integrity_check_orders",
    # r6: numeric drift monitors (E98) — value-grain window + binned
    # combinable kernels; oracle-backed, parity-swept at 3 SFs.
    "ks_drift_events",
    "psi_drift_events",
    # r6: blocked fuzzy entity matching (E99) — equi-join blocking +
    # codegen verify, kernels shared with in-window LSH rows.
    "fuzzy_name_pairs_part",
    # r6: incrementally-maintained TPC-H Q1 (E100) — the rollup-fold
    # kernel is in-window via incremental_agg_orders; oracle = full
    # recompute, parity-swept at 3 SFs.
    "tpch_q1_incremental",
    # r6: co-located Q3 (E101) — bucketed zero-exchange layout; same
    # oracle as tpch_q3; plan-gated in test_plan_shapes.
    "tpch_q3_colocated",
    # r6: schema-health drift (E102) — single-pass profile kernel is
    # in-window via profile_orders; oracle-backed, parity-swept.
    "profile_drift_orders",
    # r6: native pivot (E103) — conditional-agg kernel shared with
    # in-window cube/rollup rows; oracle-backed, parity-swept.
    "pivot_event_counts",
    # r6: SCD2 lookup join (E104) — the history-fold kernel is
    # in-window via scd2_multibatch; oracle-backed, parity-swept.
    "scd2_lookup_lineitem",
    # r6: sequence analytics (E105-E107) — the per-key window exchange
    # is in-window via sessionize/sliding-window rows; the pivot/
    # unpivot conditional-agg kernel via cube/rollup rows. All three
    # oracle-backed, parity-swept at 3 SFs.
    "event_transitions",
    "attribution_events",
    "unpivot_event_counts",
    # r6: forward as-of join (E118) — the union-merge carry kernel is
    # in-window via asof_join_events_orders (backward form);
    # oracle-backed, parity-swept at 3 SFs.
    "asof_forward_events_orders",
    # r6: entity resolution (E117) — composes E99 fuzzy pairs with the
    # CC kernel that simhash_clusters runs in-window; oracle-backed
    # (recursive-CTE closure), parity-swept at 3 SFs.
    "entity_clusters_part",
    # r6: sliding-window scrub (E115) — the span-df + rebuild kernels
    # are in-window via scrub_repeated_spans; oracle-backed,
    # parity-swept at 3 SFs.
    "scrub_repeated_windows_docs",
    # r6: kNN graph (E114) — the cosine/rank kernels are in-window via
    # ann_topk_batch; oracle-backed (exact baseline), parity-swept at
    # 3 SFs; the LSH-blocked scale path is recall-gated in pytest.
    "knn_graph_embeddings",
    # r6: shot-level video near-dup (E112) — rows-only (frame
    # decomposition of opaque bytes has no SQL form); real GIF codec
    # path pytest-gated in tests/test_imagehash.py.
    "video_near_dup_media",
    # r6: acoustic near-dup (E110) — rows-only by design (energy
    # contour has no SQL form and word-salad PCM is collision-prone;
    # measured and documented in the query docstring). Real gate:
    # tests/test_audiohash.py sine-wave locality + banded==brute.
    "audio_near_dup_media",
    # r6: session path mining (E109) — the sessionization window is
    # in-window via sessionize/sliding rows; path agg is a combinable
    # groupBy. Oracle-backed, parity-swept at 3 SFs.
    "session_paths_events",
    # r6: perceptual image near-dup (E108) — the banded signature join
    # is in-window via simhash rows; the mapInPandas media plumbing via
    # resize/audio rows. Oracle-backed (fake-tier equal-bytes law),
    # parity-swept at 3 SFs; the real pixel path is pytest-gated.
    "image_near_dup_media",
    # r6: model-based scorer — rows-only by nature (trained model);
    # pytest-gated like the IVF/sketch rows.
    "quality_score_docs",
    # r7: TPC-H completion over DERIVED partsupp/l_shipmode (the dbgen
    # clause 4.2.3 shape re-derived in both engines — see the section
    # comment above tpch_q2). Oracle-backed, parity-swept; the window
    # keeps the harder fact-heavy TPC-H rows (q1/q3/q10) that already
    # exercise the same join/agg kernels.
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q20_potential_promotion",
    "pk_projection_orders",
    "count_lineitem",
    "filter_eq_orders",
    "point_filter_lineitem",
    "simhash_docs",
    "fingerprints_docs",
    "token_counts_docs",
    "sign_buckets_embeddings",
    "hash_sample_docs",
    "hash_split_docs",
    "lang_id_docs",
    "quality_docs",
    "media_features_docs",
    "frame_sample_part",
    "distinct_users_per_type",
    "range_join_user_bursts",
    # r7 second wave: displaced by the three promoted NEW operator
    # classes (IVM / DSIR / containment) — justifications at the
    # _PROMOTED comment; all three stay oracle-backed, 3-SF
    # parity-swept, and bench-keyed.
    "quantize_embeddings",
    "incremental_agg_orders",
    "winsorize_events_value",
    # r7 second wave: registered after the window was rotated — kept
    # out of the first 50 deliberately; each is oracle-backed and
    # parity-swept (the MG merge kernel shares the rank-window +
    # broadcast-scalar shapes with in-window topk/digest rows).
    "heavy_hitters_users_events",
    # DSIR (E124): the hashed-feature explode/groupBy kernels are
    # in-window via tfidf/vocab rows; both entries oracle-backed.
    "dsir_weights_docs",
    "dsir_sample_docs",
    # IVM join maintenance (E125): delta-broadcast repair joins; the
    # monoid-fold sibling incremental_agg is in-window.
    "ivm_join_orders_customer",
    # kNN triangles (E126): the CC/graph kernels are in-window via
    # simhash_clusters/quality_propagate; oracle-backed.
    "knn_triangles_embeddings",
    # containment dedup (E128): shares the posting self-join kernel
    # with in-window ngram_jaccard/minhash rows; oracle-backed.
    "containment_pairs_docs",
    # association rules (E129): within-basket self-join kernel shared
    # with in-window jaccard/posting rows; oracle-backed.
    "assoc_rules_events",
    # closed-form stats (E130): conditional-agg pivot kernel in-window
    # via cube/pivot rows; both oracle-backed.
    "corr_matrix_events",
    "trend_events",
    # EWMA (E131): per-key Arrow fold, sessionize-class exchange;
    # oracle-backed via the closed-form identity.
    "ewma_daily_events",
    # k-anonymity (E132): the cell histogram is a plain combinable
    # groupBy (profile-class kernel); oracle-backed.
    "k_anonymity_customer",
    # r7 third wave: registered after the window was rotated — kept
    # out of the first 50 deliberately; each oracle-backed and
    # parity-swept. l-diversity (E133): the count-distinct cell
    # histogram shares the in-window k_anonymity kernel.
    "l_diversity_customer",
    # quantile sketch (E134): the summary fold/merge kernel shares the
    # MG mapInPandas + rank-window shapes the in-window heavy-hitters
    # and digest rows keep checked; exactness law oracle-stated.
    "quantile_sketch_lineitem",
    # hybrid RRF (E135): each leg's kernel is in-window (bm25_search
    # embeds the postings pipeline, ann rows the cosine top-k); the
    # fusion itself is k-sized outer joins.
    "hybrid_search_docs",
    # prefix-filter exact Jaccard (E136): the posting self-join +
    # verify kernels are in-window via ngram_jaccard/minhash rows;
    # lossless law pytest-pinned against the in-window baseline.
    "jaccard_prefix_pairs_docs",
    # MAD outliers (E137): the key-window rank kernel is in-window via
    # group_quantiles/topk rows; the z-score sibling is in-window.
    "mad_outliers_events",
    # PMI collocations (E138): the bigram explode/count kernel is
    # in-window via bigram_logprob's machinery (pytest) and the
    # combinable-groupBy rows; oracle-backed at 3 SFs.
    "pmi_collocations_docs",
    # bitmap exact-distinct rollups (E140): the combinable-groupBy
    # rollup kernel is in-window via approx_distinct/profile rows;
    # exactness oracle-stated (plain COUNT DISTINCT mirror).
    "bitmap_distinct_users_events",
    # PageRank (E141): the per-round join+groupBy kernel is in-window
    # via the promoted quality_propagate row (same E120 discipline).
    "pagerank_embeddings",
    # FD audit (E142): the count-distinct groupBy kernel is in-window
    # via k_anonymity/profile rows; per-pair mix oracle-stated.
    "fd_audit_orders",
    # Benford screen (E143): the pivoted conditional-count kernel is
    # in-window via pivot/cube rows; fixed-order float law in pytest.
    "benford_screen_events",
    # MWU drift (E144): the value-grain cumulative-window kernel is
    # in-window via the ks_drift machinery (same shape, rank-based).
    "mwu_drift_events",
    # Theil-Sen (E146): the group-keyed pair join + rank-median kernel
    # is in-window via group_quantiles/interval rows; robust law in
    # pytest against the in-window OLS trend row.
    "theil_sen_trend_events",
    # mix entropy (E147): the pivoted conditional-count kernel is
    # in-window via pivot/cube rows (same shape as Benford).
    "entropy_mix_events",
    # two-proportion z-test (E148): 1-row agg + broadcast scalar
    # kernel, in-window via digest/count rows; fixed-order float law.
    "prop_ztest_events",
    # r8 second wave rotation OUT (displaced by the promoted full-outer
    # IVM + t-closeness): both pure-codegen text scores whose kernels
    # stay in-window — curate_corpus_docs runs the Gopher rule set
    # end-to-end, dsir_weights/dsir_sample the hashed-LM kernel.
    "gopher_quality_docs",
    "unigram_logprob_docs",
    # r8 second wave siblings kept out of the window (their harder
    # family representative is in-window): extremum IVM's delta fold is
    # certified via the promoted full-outer IVM discipline (same keyed
    # -delta laws on the harder join shape) and its own refresh-
    # equivalence oracle stays parity-swept; the ordered t-closeness
    # shares the integer-numerator EMD kernel with the in-window
    # categorical variant.
    "ivm_extrema_orders",
    "t_closeness_ordered_customer",
    # exact top-k frequent (E156): shares the two-level support fold
    # certified in-window via the promoted full-outer IVM discipline;
    # its refresh-equivalence oracle stays parity-swept at 3 SFs.
    "ivm_frequent_orders",
    # golden-record merge (E157): the groupBy max_by kernel is
    # in-window via latest-per-key / keep-best composites; its own
    # rank-window oracle stays parity-swept at 3 SFs + sf1.
    "golden_records_events",
    # token-budget cut (E158): the hash-bucket discipline is in-window
    # via hash_split/quota/stratified composites; its exact global-
    # take-while oracle stays parity-swept at 3 SFs + sf1.
    "token_budget_sample_docs",
    # exact bitmap overlap (E159): the bitmap regroup kernel is
    # in-window via bitmap_distinct_users_events; the inclusion-
    # exclusion identity stays parity-swept at 3 SFs + sf1.
    "bitmap_overlap_events",
    # exact distinct under deletes (E160): third derive of the E152
    # support table (family representative in-window via the promoted
    # full-outer IVM); refresh-equivalence oracle parity-swept.
    # (r9: ivm_extrema/frequent/distinct + t_closeness_ordered +
    # golden_records + token_budget + bitmap_overlap rotated back IN —
    # entries above kept for the r8 window-history record; _PROMOTED
    # wins the ordering.)
    "ivm_distinct_orders",
    # ------------------------------------------------------------------
    # r9 rotation OUT (displaced by the fifteen r9 promotions; every
    # row below is oracle-backed, 3-SF parity-swept, in the sf1 VALUE
    # sweep, and was driver-green in an earlier round):
    # hash projection: the identical md5(concat_ws) kernel runs
    # in-window inside sync_merge_orders and partition_digests_orders.
    "row_hash_orders",
    # exact dedup groups: dedup_keep_best_docs (in-window) is the
    # strictly harder keep-one variant of the same groupBy discipline.
    "dedup_exact_docs",
    # one-expression JSON projection; the variant-typing kernel rides
    # in-window via sessionize/event composites.
    "json_extract_events",
    # cosine near-dup pairs: semantic_dedup_embeddings (in-window)
    # runs the same cosine kernel plus the cluster fold on top.
    "embedding_near_dup_pairs",
    # brute-force ANN top-k: cosine kernel in-window via
    # semantic_dedup; the rank-window discipline via dedup_keep_best.
    "ann_topk_batch",
    # salted join: result-identical to the unsalted sync merge
    # (in-window); the skew discipline stays bench-gated (test_skew).
    "salted_join_orders_customer",
    # repetition scores: curate_corpus_docs (in-window) runs the
    # Gopher rule set end-to-end including the repetition rules.
    "repetition_docs",
    # hash-bucket quota sampling: token_budget_sample_docs (promoted)
    # is the strictly harder exact-prefix variant of the same
    # hash-priority discipline; mixture/stratified stay parity-swept.
    "quota_sample_docs",
    # simple agg-join rollup: the three promoted TPC-H classics are
    # strictly harder instances of the same join+groupBy shape.
    "supplier_revenue",
    # per-column stats profile: fd_audit_orders (in-window) plus the
    # digest rows keep the metadata-scan kernel machine-checked.
    "profile_orders",
    # bipartite MinHash pairs: minhash_lsh_pairs_docs (in-window)
    # certifies the same signature+band kernel end-to-end.
    "minhash_pairs_between_docs",
    # fixed-size chunk explode: pack_sequences_docs (in-window) runs
    # the harder sequence-slicing discipline.
    "chunk_docs",
    # shard rollup of the deterministic export: the export path is
    # pytest-proven; the rollup is a COUNT/groupBy other rows cover.
    "shard_stats_docs",
    # date-spine gap fill: the generate_series spine kernel stays
    # parity-swept (sliding/cohort/retention family at 3 SFs + sf1).
    "gap_fill_daily_events",
    # weighted priority sampling: the hash-priority order is certified
    # by the promoted token_budget cut; mixture_sample stays in-window.
    "priority_sample_docs",
    # E161 (r9, registered past position 50 by design): the chunked
    # EWMA twin — same output and oracle as the in-window
    # ewma_daily_events, different engine path (carry-in fold);
    # parity-swept at 3 SFs + sf1.
    "ewma_chunked_daily_events",
    # E162/E163 (r9 second wave, registered past position 50 by
    # design): duplicated-span extraction and the rule funnel are new
    # surface — they enter the window by rotation in a later round,
    # not by displacing the planned r9 window.
    "duplicate_spans_docs",
    "curation_funnel_docs",
    "temperature_mixture_docs",
    "duplication_profile_docs",
    "unimax_sample_docs",
    "decontaminate_spans_docs",
    "unimax_tokens_docs",
    "exact_ntile_events",
    "exact_ntile_by_type_events",
    # r10: the KN-smoothed LM (E172) registers past the window by the
    # standing discipline (oracle-backed, parity-swept; the bigram-LM
    # kernel class is in-window via bigram_logprob_docs this round).
    "kn_bigram_logprob_docs",
    # r10: sorted-export manifest (E173) — the NTILE kernel is
    # in-window via exact_ntile machinery representatives; the export
    # round trip is pytest-gated (test_sorted_export.py).
    "sorted_export_manifest_docs",
    # r10: margin-based bitext mining (E174) — the batched-kNN kernel
    # is in-window via ann-family representatives; oracle-backed.
    "bitext_mine_embeddings",
    # r10: randomization significance test (E175) — the two-sample
    # stats class is in-window via mwu_drift/ks_drift; oracle-backed.
    "randomization_test_events",
    # r10: DP count release (E176) — one combinable groupBy + codegen
    # noise; oracle reproduces the seeded release; privacy family
    # in-window via k_anonymity/t_closeness rows.
    "dp_event_type_counts",
    # r10: PCA whitening (E177) — rows-only by nature
    # (eigendecomposition); pytest-law-gated like the IVF/PQ rows.
    "pca_whiten_embeddings",
    # r11: probed-tier bitext mining (E174 scale path) — rows-only by
    # nature (LSH candidate generation); recall-vs-exact pytest-gated,
    # candidate-fraction economics in BENCH_SCALE.
    "bitext_mine_embeddings_lsh",
    # r11 second wave (all oracle-backed, registered past the window,
    # join the ROTATION.md queue tail): E178 weighted reservoir
    # sampling (A-ES), E179 Poisson-bootstrap mean CI, E180 corpus card.
    "weighted_sample_docs",
    "bootstrap_mean_ci_events",
    "corpus_card_docs",
    # r11 rotation displacements not already carrying a _DEMOTED entry
    # (driver-green in CORRECTNESS_r10; kernels covered in-window: the
    # TPC-H join family by the 19 in-window TPC-H rows, the iterative
    # propagation class by its pagerank sibling's oracle sweeps, the
    # left-outer IVM by the in-window full-outer IVM row):
    "tpch_q9_product_type_profit",
    "quality_propagate_embeddings",
    "ivm_left_join_orders_customer",
    # r11 third wave: E181 stratified weighted sampling + E182
    # cross-source overlap audit (oracle-backed, past the window,
    # queue tail).
    "weighted_sample_by_lang_docs",
    "source_overlap_docs",
    # r11 third wave: E183 incremental corpus card (refresh-equivalence
    # oracle — the fold IS the law; past the window, queue tail).
    "corpus_card_incremental_docs",
    # r12: E184 stratified-vs-global A-ES consistency law (VERDICT r11
    # item 7 — the pytest agreement law as an oracle-backed key;
    # past the window, queue tail).
    "stratified_consistency_docs",
    # r12 second wave: E186 χ² independence audit, E187 source
    # concentration (Gini/HHI/top-share), E188 Cohen's κ langid
    # agreement, E189 n-gram diversity TTRs — all oracle-backed
    # (value-exact at sf0.01 on landing), past the window, queue tail.
    "chi2_independence_events",
    "source_concentration_docs",
    "langid_kappa_docs",
    "ngram_diversity_docs",
    # r12 third wave: E190 JSD categorical drift, E191 transition
    # entropy/perplexity, E192 Zipf-law fit — oracle-backed
    # (value-exact at sf0.01 on landing), past the window, queue tail.
    "js_weekend_drift_events",
    "transition_entropy_events",
    "zipf_fit_docs",
    # r12 fourth wave: E193 stratified k-fold balance audit, E194
    # Kaplan-Meier censored retention — oracle-backed (value-exact at
    # sf0.01 on landing), past the window, queue tail.
    "stratified_kfold_docs",
    "km_retention_events",
)


def _driver_order(d: dict) -> dict:
    # _PROMOTED wins over _DEMOTED: a name on both lists (rotated out
    # in one round, back in later — the lists are window HISTORY) sits
    # at the front.
    front = {k: d[k] for k in _PROMOTED if k in d}
    head = {
        k: v
        for k, v in d.items()
        if k not in _DEMOTED and k not in _PROMOTED
    }
    tail = {
        k: d[k] for k in _DEMOTED if k in d and k not in _PROMOTED
    }
    return {**front, **head, **tail}


def queries() -> dict[str, QueryFn]:
    return _driver_order(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _driver_order(_ORACLES)


