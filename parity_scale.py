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
