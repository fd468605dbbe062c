"""Physical-plan regression gates: the properties that make these
queries scale — pushed filters, pruned columns, broadcast dimension
joins, no accidental cartesian products, whole-stage codegen — asserted
on the formatted explain so a future edit can't silently regress them.

These are the .explain() checks the 100 TB story depends on: a plan
that reads all columns for a 2-column projection, or degrades a
bucketed near-dup join to a nested-loop cross product, is wrong even
if its output is correct.
"""

import pytest

from mysql_syncer_spark import queries as registry


def plan_of(spark, name, sf_dir) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, "filter_eq_orders", sf_dir)
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan, plan


def test_projection_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, "pk_projection_orders", sf_dir)
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan, plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, "revenue_by_nation", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_linear_window(spark, sf_dir):
    """The union-merge as-of topology: one Window over one sort, NO join
    operator at all (the pair-explosion rewrite this replaced was ~30×
    slower at sf0.1)."""
    plan = plan_of(spark, "asof_join_events_orders", sf_dir)
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1


@pytest.mark.parametrize(
    "name",
    [
        "minhash_lsh_pairs_docs",
        "ngram_jaccard_pairs_docs",
        "simhash_near_dup_docs",
        "embedding_near_dup_pairs",
        "sync_merge_orders",
        "missing_rows_orders",
    ],
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_agg_stays_in_codegen(spark, sf_dir):
    # AQE's pre-execution plan hides codegen stage markers — build this
    # one plan with AQE off to see the WholeStageCodegen spans
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = plan_of(spark, "agg_pricing_summary", sf_dir)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "codegen id" in plan, plan
    # money math must stay JVM-side: no python UDF eval nodes
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sample_is_shuffle_free(spark, sf_dir):
    plan = plan_of(spark, "hash_sample_docs", sf_dir)
    assert "Exchange" not in plan, plan


def test_contamination_broadcasts_eval_grams(spark, sf_dir):
    """The decontamination join must broadcast the eval n-gram set —
    corpus rows shuffling for this join would be the 100 TB bottleneck."""
    plan = plan_of(spark, "contamination_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_is_shuffle_free(spark, sf_dir):
    """Per-row array math: any KEYED Exchange in this plan is a
    regression. The one permitted exchange is spread_small's gated
    ROUND-ROBIN repartition (r12) — it vanishes above the scale gate."""
    import re

    plan = plan_of(spark, "repetition_docs", sf_dir)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 1, plan


def test_packing_is_single_window_shuffle(spark, sf_dir):
    """Packing must be ONE exchange (the window partition on the bucket
    key) — a second shuffle would mean the cumsum isn't bucket-local."""
    import re

    plan = plan_of(spark, "pack_sequences_docs", sf_dir)
    # formatted explain lists each node once as "(n) Exchange" in the
    # details section (the tree section repeats them with +- prefixes)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_exchanges == 1, plan


def test_supplier_star_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, "supplier_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_broadcasts_idf(spark, sf_dir):
    """The idf (vocabulary) join must broadcast — at corpus scale the
    vocab is dim-sized vs the (doc, term) tf frame."""
    plan = plan_of(spark, "tfidf_topk_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_priority_sample_is_partial_topn(spark, sf_dir):
    """Weighted sampling must be TakeOrderedAndProject (map-side partial
    top-n) — a global Sort materializing every loser is the wrong plan."""
    plan = plan_of(spark, "priority_sample_docs", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_centroids_single_combinable_shuffle(spark, sf_dir):
    """One hash exchange on (label, dim), with a partial aggregate below
    it (map-side combine) — the shuffle carries |labels|x dims rows."""
    plan = plan_of(spark, "label_centroids_embeddings", sf_dir)
    tree = plan.split("\n\n")[0]  # the numbered operator tree
    assert tree.count("Exchange") == 1, plan
    assert "hashpartitioning" in plan, plan
    assert "Functions [2]: [partial_avg" in plan, plan


def test_minhash_between_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "minhash_pairs_between_docs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    """Chunking is row-local (split → sequence-explode → slice): any
    Exchange would mean the explode fan-out is being shuffled, which at
    corpus scale multiplies the shuffle volume by the window count."""
    plan = plan_of(spark, "chunk_docs", sf_dir)
    assert "Exchange" not in plan, plan


def test_shard_stats_is_one_partial_agg(spark, sf_dir):
    """The shard manifest must be a map-side-combinable groupBy over
    n_shards keys: one Exchange, partial HashAggregate before it."""
    plan = plan_of(spark, "shard_stats_docs", sf_dir)
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read)
    assert "HashAggregate" in plan


def test_mixture_sample_broadcasts_quotas(spark, sf_dir):
    """The per-group quota table (#groups rows) must broadcast to the
    corpus; a SortMergeJoin here would shuffle the whole corpus twice
    (once for the join, once for the rank window)."""
    plan = plan_of(spark, "mixture_sample_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_gopher_rules_shuffle_free(spark, sf_dir):
    """E58: the whole rule set is per-row ratio arithmetic — any KEYED
    Exchange in this plan is a regression. The one permitted exchange
    is spread_small's gated ROUND-ROBIN repartition (r12): below the
    scale gate it spreads the single-task scan so the rule evaluation
    fills the cluster; above the gate it disappears and the plan is
    exchange-free again."""
    import re

    plan = plan_of(spark, "gopher_quality_docs", sf_dir)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 1, plan


def test_scrub_spans_broadcasts_blocklist(spark, sf_dir):
    """E57: the frequent-span blocklist is boilerplate-sized and must
    reach the corpus-sized span stream as a broadcast anti-join — a
    SortMergeJoin would reshuffle the whole span stream a third time."""
    plan = plan_of(spark, "scrub_repeated_spans_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_broadcasts_vocab(spark, sf_dir):
    """E59: the vocabulary must broadcast onto the token stream — a
    SortMergeJoin would shuffle the corpus-sized stream on the term."""
    plan = plan_of(spark, "unigram_logprob_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_interval_join_not_nested_loop(spark, sf_dir):
    """E62: the bucket decomposition must plan as a hash join on the
    bucket id — BroadcastNestedLoopJoin is exactly the quadratic plan
    the operator exists to avoid."""
    plan = plan_of(spark, "interval_join_error_windows", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jl_projection_shuffle_free(spark, sf_dir):
    """E63: the projection is per-row arithmetic with a literal matrix
    — any Exchange or join in this plan is a regression."""
    plan = plan_of(spark, "jl_project_embeddings", sf_dir)
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_tpch_q3_broadcasts_customer_and_pushes_filters(spark, sf_dir):
    """E75: the segment-filtered customer dim must broadcast, the date
    filters must reach the scans, and the top-10 must be a partial
    TakeOrdered — no global sort of the aggregated stream."""
    plan = plan_of(spark, "tpch_q3_shipping_priority", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "PushedFilters: [" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_tpch_q10_broadcasts_nation(spark, sf_dir):
    plan = plan_of(spark, "tpch_q10_returned_items", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_cube_is_single_expand_single_agg_shuffle(spark, sf_dir):
    """E64: CUBE = one Expand node feeding ONE exchange — four separate
    scans/aggs would be the naive plan."""
    import re

    plan = plan_of(spark, "cube_pricing_summary", sf_dir)
    assert len(re.findall(r"^\(\d+\) Expand$", plan, re.M)) == 1, plan
    # ONE keyed (hashpartitioning) agg exchange; spread_small's gated
    # round-robin repartition below the Expand (r12) is allowed — it
    # vanishes above the scale gate
    n_keyed = plan.count("hashpartitioning")
    assert n_keyed == 1, plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_exchanges <= 2, plan


def test_drift_monitor_is_takeordered(spark, sf_dir):
    """E77: the top-k must be TakeOrderedAndProject (map-side partial
    top-k), and the totals must reach the vocab via broadcast."""
    plan = plan_of(spark, "vocab_drift_docs", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


def test_tpch_q4_semi_join_with_pushed_window(spark, sf_dir):
    """Q4: the quarter window must reach the orders scan and the
    EXISTS probe must plan as a hash semi join (the cross-table
    shipdate inequality rides the equi-join as a residual — a
    BroadcastNestedLoopJoin here would re-scan lineitem per order)."""
    plan = plan_of(spark, "tpch_q4_order_priority", sf_dir)
    assert "GreaterThanOrEqual(o_orderdate,1996-07-01" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_q19_disjunction_pushed_to_both_scans(spark, sf_dir):
    """Q19: Catalyst must split the OR-of-ANDs spanning both join
    sides into a part-only disjunction AND a lineitem-only quantity
    disjunction, each pushed to its scan — reading either table
    unfiltered is the regression this query exists to catch."""
    plan = plan_of(spark, "tpch_q19_discounted_revenue", sf_dir)
    assert "EqualTo(p_brand,Brand#12)" in plan, plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q21_exists_chain_stays_hash_joins(spark, sf_dir):
    """Q21: the EXISTS / NOT EXISTS self-joins carry supplier- and
    shipdate-inequalities, but each has an l_orderkey equi-component —
    they must plan as hash joins with residuals, never nested-loop,
    and the top-20 must be a TakeOrdered, not a global sort."""
    plan = plan_of(spark, "tpch_q21_waiting_supplier", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q15_argmax_is_broadcast_scalar(spark, sf_dir):
    """Q15: the max-revenue threshold must arrive as a broadcast 1-row
    join against the per-supplier aggregate — a driver collect or a
    sort-the-world plan would not survive scale."""
    plan = plan_of(spark, "tpch_q15_top_supplier", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q3_colocated_zero_hash_exchange(spark, sf_dir):
    """E101: with orders and lineitem pre-bucketed on the order key,
    the fact-fact join AND the (l_orderkey, o_orderdate) aggregate
    must run with ZERO hash exchanges — the only data movement is the
    broadcast of the filtered customer dim. Both fact scans must read
    the bucketed layout."""
    import re

    plan = plan_of(spark, "tpch_q3_colocated", sf_dir)
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 0, plan
    assert plan.count("Bucketed: true") == 2, plan
    assert "CartesianProduct" not in plan, plan


def test_image_near_dup_banded_no_cartesian(spark, sf_dir):
    """E108: the perceptual-pair join must stay a hash equi-join on
    (chunk, value) — never a cross product over images."""
    plan = plan_of(spark, "image_near_dup_media", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_video_near_dup_inverted_index_no_cartesian(spark, sf_dir):
    """E112: video pairs come from the frame-hash equi-join."""
    plan = plan_of(spark, "video_near_dup_media", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_knn_graph_lsh_no_cartesian(spark, sf_dir):
    """E114 scale path: multi-probe candidates are an equi-join on the
    probe bucket (the exact baseline is the ONLY opt-in cross)."""
    from mysql_syncer_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = knn_graph(emb, k=5, block="lsh", lsh_bits=8, probe_radius=1)
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_window_scrub_blocklist_broadcasts(spark, sf_dir):
    """E115: the frequent-window blocklist join is broadcast (the
    corpus-sized span stream must not reshuffle for the filter)."""
    plan = plan_of(spark, "scrub_repeated_windows_docs", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_session_paths_single_window_exchange(spark, sf_dir):
    """E109: exactly one data-sized exchange keyed on the user — the
    path/share aggregations ride the matrix, not the stream."""
    plan = plan_of(spark, "session_paths_events", sf_dir)
    # one hashpartitioning on the user key: both windows AND the
    # (user, session) groupBy ride it (HashPartitioning(user) satisfies
    # the superset-key clustering); the remaining exchanges are
    # path-matrix-sized
    assert plan.count("hashpartitioning(user_id") == 1, plan


# ---------------------------------------------------------------------
# r7: TPC-H over derived partsupp/l_shipmode
# ---------------------------------------------------------------------

@pytest.mark.parametrize(
    "name",
    [
        "tpch_q2_min_cost_supplier",
        "tpch_q9_product_type_profit",
        "tpch_q12_shipmode_priority",
        "tpch_q20_potential_promotion",
    ],
)
def test_tpch_derived_no_cartesian(spark, sf_dir, name):
    """The derived-partsupp joins must stay keyed joins (the derivation
    is a per-row explode over part, never a cross join)."""
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_tpch_q11_only_scalar_bnlj(spark, sf_dir):
    """Q11's only non-keyed joins are the two 1-row scalar injections
    (grand total + part count) — broadcast nested loops over a single
    row, the standard scalar pattern, never a data-sized cross."""
    plan = plan_of(spark, "tpch_q11_important_stock", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_tpch_q12_window_filter_pushed(spark, sf_dir):
    """The 1996 ship-date window must reach the lineitem scan; the
    derived ship-mode CASE is per-row codegen after it."""
    plan = plan_of(spark, "tpch_q12_shipmode_priority", sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_shipdate" in plan


def test_tpch_q2_min_is_window_not_self_join(spark, sf_dir):
    """Per-part MIN over eligible suppliers is ONE window shuffle, not
    a groupBy + re-join of the eligible set (which would re-scan the
    4-way join twice)."""
    plan = plan_of(spark, "tpch_q2_min_cost_supplier", sf_dir)
    assert "Window" in plan
    assert "SortMergeJoin" not in plan  # all dims broadcast at test SF


def test_tpch_q9_part_filter_pushed(spark, sf_dir):
    plan = plan_of(spark, "tpch_q9_product_type_profit", sf_dir)
    assert "StringContains(p_name,red)" in plan, plan


# ---------------------------------------------------------------------------
# round-7 second wave: MG heavy hitters, DSIR, IVM, triangles,
# containment, association rules
# ---------------------------------------------------------------------------


def test_heavy_hitters_shuffles_are_summary_sized(spark, sf_dir):
    """The only pre-merge stage over the DATA is the mapInPandas fold
    (zero shuffle); everything after operates on <= capacity x
    n_partitions summary rows. No join in the plan touches the raw
    events twice."""
    plan = plan_of(spark, "heavy_hitters_users_events", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the rank-window compression + scalar injections broadcast
    assert "BroadcastNestedLoopJoin" in plan


def test_dsir_logratio_table_broadcasts(spark, sf_dir):
    """The 1024-row bucket log-ratio table must broadcast onto the
    feature stream (never shuffle the exploded features against it);
    the totals are a 1-row scalar injection. The ONE permitted
    SortMergeJoin is the final doc_id-keyed left-outer that restores
    zero-weight featureless docs — corpus⋈corpus on the id, the join
    bucketing co-locates at scale."""
    plan = plan_of(spark, "dsir_weights_docs", sf_dir)
    assert "BroadcastHashJoin" in plan
    # formatted explain lists each node once in the tree and once in
    # the detail section — count the "(n) SortMergeJoin" detail form
    assert plan.count(") SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_dsir_sample_is_partial_topn(spark, sf_dir):
    plan = plan_of(spark, "dsir_sample_docs", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_ivm_maintenance_joins_are_broadcast(spark, sf_dir):
    """Every anti/semi/repair join in the registry's IVM scenario
    broadcasts a delta-derived frame (the deltas are %-filtered
    slices); no SortMergeJoin may appear in the maintenance terms.
    (The bootstrap join inside the same lineage is also broadcast at
    fixture scale: customer is dimension-sized.)"""
    plan = plan_of(spark, "ivm_join_orders_customer", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_triangles_no_cartesian(spark, sf_dir):
    """Wedge generation and closure are equi-joins on edge keys —
    a cross product here would be corpus² and is the classic naive
    triangle implementation this operator exists to avoid."""
    plan = plan_of(spark, "knn_triangles_embeddings", sf_dir)
    assert "CartesianProduct" not in plan


def test_containment_shares_posting_join_shape(spark, sf_dir):
    """Pairs come from the shingle posting-list equi self-join (the
    ngram_jaccard skeleton): no cartesian, and the df-cap window means
    at most shuffles on (shingle)/(doc) keys."""
    plan = plan_of(spark, "containment_pairs_docs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_assoc_supports_broadcast(spark, sf_dir):
    """Item supports and the basket-count scalar broadcast onto the
    pair counts; the within-basket self-join is an equi-join on the
    basket key, never a cross."""
    plan = plan_of(spark, "assoc_rules_events", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# round-7 third wave: l-diversity, quantile sketch, hybrid RRF, prefix
# Jaccard, MAD outliers, PMI collocations
# ---------------------------------------------------------------------------


def test_l_diversity_single_combinable_groupby(spark, sf_dir):
    """The audit is ONE count-distinct groupBy over a column-pruned
    scan — no join of any kind in the plan."""
    plan = plan_of(spark, "l_diversity_customer", sf_dir)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert (
        "ReadSchema: struct<c_nationkey:int,c_acctbal:double,"
        "c_mktsegment:string>" in plan
    )


def test_quantile_sketch_scans_one_column(spark, sf_dir):
    """The fold reads ONLY the value column; everything after the
    mapInPandas stage is summary-sized (the two scalar injections are
    1-row broadcast BNLJs, and no data-sized join exists)."""
    plan = plan_of(spark, "quantile_sketch_lineitem", sf_dir)
    assert "ReadSchema: struct<l_quantity:double>" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan


def test_hybrid_rrf_fusion_is_k_sized(spark, sf_dir):
    """Each leg ends in a top-n (TakeOrderedAndProject); the only
    permitted SortMergeJoin is the k-sized full-outer fusion of the
    two rank lists (Spark can't broadcast a two-sided full outer) —
    corpus-sized joins all broadcast."""
    plan = plan_of(spark, "hybrid_search_docs", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert plan.count(") SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_jaccard_prefix_no_cartesian_no_smj(spark, sf_dir):
    """Candidate generation and verification are keyed equi-joins on
    shingle / pair keys (broadcast at fixture scale); the exact
    verify must never degrade to a cartesian."""
    plan = plan_of(spark, "jaccard_prefix_pairs_docs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mad_outliers_keyed_joins_only(spark, sf_dir):
    """Two key-window passes + two group-frame joins; the group
    frames join on the group key (equi), never a cross join."""
    plan = plan_of(spark, "mad_outliers_events", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "ReadSchema: struct<event_id:bigint,event_type:string,"
        "value:double>" in plan
    )


def test_pmi_marginals_derive_from_counts(spark, sf_dir):
    """Marginals join back onto the counts table (broadcast/equi) and
    the result is a partial top-k — never a second corpus pass
    shuffled against the first."""
    plan = plan_of(spark, "pmi_collocations_docs", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# round-7 fourth wave: bitmap rollups, FD audit, Benford, MWU drift.
# (pagerank is gated by its pytest laws instead: its query function
# cuts lineage with eager localCheckpoints, so the final plan is a
# checkpoint scan — nothing structural left to assert.)
# ---------------------------------------------------------------------------


def test_bitmap_rollup_joinfree_and_pruned(spark, sf_dir):
    """The whole rollup -> regroup -> popcount pipeline is aggregation
    only — no join of any kind — over a 3-column pruned scan."""
    plan = plan_of(spark, "bitmap_distinct_users_events", sf_dir)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert (
        "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint,"
        "event_type:string>" in plan
    )


def test_fd_audit_prunes_per_pair(spark, sf_dir):
    """Each candidate pair's branch reads ONLY its two columns (the
    union must not widen the scans), and no branch joins."""
    plan = plan_of(spark, "fd_audit_orders", sf_dir)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>" in plan
    assert (
        "ReadSchema: struct<o_custkey:bigint,o_orderpriority:string>"
        in plan
    )


def test_benford_single_groupby(spark, sf_dir):
    """Nine pivoted conditional counts ride ONE combinable groupBy —
    join-free, two exchanges (partial/final), 2-column scan."""
    plan = plan_of(spark, "benford_screen_events", sf_dir)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "ReadSchema: struct<event_type:string,value:double>" in plan
    assert plan.count(") Exchange") <= 2


def test_mwu_value_grain_window(spark, sf_dir):
    """The raw stream is reduced to value-grain rows by a combinable
    groupBy BEFORE any window; no join appears anywhere."""
    plan = plan_of(spark, "mwu_drift_events", sf_dir)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count(") Exchange") <= 2


# ---------------------------------------------------------------------------
# round-8 second wave: full-outer IVM, two-level extremum, t-closeness
# ---------------------------------------------------------------------------


def test_full_join_ivm_one_smj_rest_broadcast(spark, sf_dir):
    """Every join touching the materialized view or recovering old
    join keys is broadcast (anti/semi on delta-derived frames); the
    ONE SortMergeJoin Spark permits no broadcast for is the
    full-outer region rebuild between two delta-keyed slices."""
    import re

    plan = plan_of(spark, "ivm_full_join_orders_customer", sf_dir)
    assert set(re.findall(r"SortMergeJoin (\w+)", plan)) <= {"FullOuter"}
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_extremum_ivm_broadcast_pruned(spark, sf_dir):
    """The extremum refresh prunes to touched groups via broadcast
    anti/semi; the only shuffling join is the support merge (full
    outer on (group, value) — state × delta aggregate, both
    values-sized). Scan reads only the three needed columns."""
    import re

    plan = plan_of(spark, "ivm_extrema_orders", sf_dir)
    assert set(re.findall(r"SortMergeJoin (\w+)", plan)) <= {"FullOuter"}
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert (
        "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,"
        "o_totalprice:double>" in plan
    )


def test_t_closeness_broadcast_histogram(spark, sf_dir):
    """The value-domain histogram and the 1-row total are broadcast
    (5-row and scalar frames); the data-sized path is one combinable
    groupBy on (cell, value) + a cell-grain window — no SortMergeJoin,
    no data-sized cross join, 3-column scan."""
    plan = plan_of(spark, "t_closeness_customer", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert (
        "ReadSchema: struct<c_nationkey:int,c_acctbal:double,"
        "c_mktsegment:string>" in plan
    )


def test_t_closeness_ordered_scaffold_is_domain_sized(spark, sf_dir):
    """The cells × domain scaffold cross-joins only BROADCAST frames
    (the m-row histogram and the 1-row totals) — permitted
    BroadcastNestedLoopJoins; nothing data-sized shuffles for a join
    and the cumulative pass is one window over the scaffold."""
    plan = plan_of(spark, "t_closeness_ordered_customer", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "duplicate_spans_docs",
        "decontaminate_spans_docs",
        "duplication_profile_docs",
        "unimax_sample_docs",
        "temperature_mixture_docs",
        "curation_funnel_docs",
    ],
)
def test_r9_wave_no_cartesian_and_pruned_scan(spark, sf_dir, name):
    """The round-9 wave: no nested-loop/cartesian anywhere, and the
    documents scan pruned to the columns the query actually touches
    (never n_chars/source ballast for the span family)."""
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, name
    # temperature_mixture carries the ONE sanctioned nested-loop shape:
    # the 1-row broadcast min-scale scalar (same pattern as
    # mixture_sample / the similarity scalar joins) — anything else
    # nested-loop is a regression
    if name != "temperature_mixture_docs":
        assert "BroadcastNestedLoopJoin" not in plan, name
    if name in (
        "duplicate_spans_docs",
        "decontaminate_spans_docs",
        "duplication_profile_docs",
    ):
        assert "n_chars" not in plan, name  # column pruning reached scan


def test_rule_funnel_single_data_shuffle(spark, sf_dir):
    """The funnel's only data-sized exchange is the first-failing
    groupBy; the ledger window runs on the rules-sized aggregate
    (SinglePartition exchange of a tiny frame is expected, a
    data-sized global window is not)."""
    plan = plan_of(spark, "curation_funnel_docs", sf_dir)
    # one hash exchange for the groupBy over the data; everything else
    # is single-partition ledger work
    import re

    hash_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert hash_exchanges <= 2, plan  # groupBy + (ledger join side)


def test_kn_bigram_no_cartesian_and_broadcast_stats(spark, sf_dir):
    """E172: the KN probability table joins the vocab-sized type-count
    frames by BROADCAST and the scalar B by a broadcast nested loop
    (one row — the only acceptable 'cartesian'); the doc-stream
    probability lookup must be a hash join, never a cartesian
    product."""
    plan = plan_of(spark, "kn_bigram_logprob_docs", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sorted_export_manifest_no_global_sort_window(spark, sf_dir):
    """E173: the manifest (and the NTILE assignment under it) must not
    run the naive single-partition global sort window the oracle
    deliberately runs — every Window in the plan is partitioned (no
    'Window [...]' over an empty partition spec feeding the full
    corpus; the E171 decomposition windows run over the bounded
    histogram/bucket frames)."""
    plan = plan_of(spark, "sorted_export_manifest_docs", sf_dir)
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan, plan
    # the global-sort smell: an Exchange SinglePartition directly under
    # a Window operator
    import re

    assert not re.search(
        r"Exchange SinglePartition[\s\S]{0,400}?Window", plan
    ), plan
