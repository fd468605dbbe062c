"""Full-registry oracle parity sweep — closes the demoted-query blind
spot (queries the driver's 50-row window can no longer reach stay
evidenced every round).

Runs EVERY ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, compares row count + column names
+ order-insensitive canonical values (the driver's gate), and writes
one JSON file::

    python parity.py [--sf /root/testdata/sf0.01] [--out PARITY.json]

Queries with no oracle record ``{"mode": "rows_only", "rows": N}``.
Exit code 1 if any oracle-backed query mismatches.
"""

import argparse
import json
import math
import os
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="PARITY.json")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="restrict the sweep to these query names (targeted "
        "re-verification after touching an operator)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    from mysql_syncer_spark.sources.catalog import configure_session

    # run the sweep under the engine's declared session config
    # (configure_session) so parity certifies results under the same
    # join-strategy/AQE settings bench.py and the executor run with
    spark = configure_session(
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    if args.only:
        missing = [n for n in args.only if n not in qs]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        qs = {n: qs[n] for n in args.only}
    results, bad = {}, []
    for name in sorted(qs):
        t0 = time.time()
        rec = {}
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in osql:
                rec = {"mode": "rows_only", "rows": len(srows)}
            else:
                res = con.execute(osql[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                cols_match = sorted(scols) == sorted(ocols)
                rows_match = len(srows) == len(orows)
                values_match = False
                if cols_match and rows_match:
                    sc = _canon_rows(
                        scols, [[r[c] for c in scols] for r in srows]
                    )
                    values_match = sc == _canon_rows(ocols, orows)
                rec = {
                    "mode": "oracle",
                    "rows": len(srows),
                    "oracle_rows": len(orows),
                    "cols_match": cols_match,
                    "rows_match": rows_match,
                    "values_match": values_match,
                }
                if not (cols_match and rows_match and values_match):
                    bad.append(name)
        except Exception as ex:  # noqa: BLE001 - recorded per query
            rec = {"mode": "error", "error": f"{type(ex).__name__}: {ex}"}
            bad.append(name)
        rec["seconds"] = round(time.time() - t0, 2)
        results[name] = rec
        status = "FAIL" if name in bad else "ok"
        print(f"  {name}: {status} ({rec['seconds']}s)", flush=True)

    n_oracle = sum(1 for r in results.values() if r.get("mode") == "oracle")
    summary = {
        "sf_dir": args.sf,
        "total": len(results),
        "oracle_backed": n_oracle,
        "rows_only": sum(
            1 for r in results.values() if r.get("mode") == "rows_only"
        ),
        "failures": sorted(bad),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1)
    print(json.dumps(summary))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
