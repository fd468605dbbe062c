"""CLI entry points (the reference's main.php / SyncTable.php /
SyncTablePartition.php equivalents), driven in-process with an injected
session."""

import io
import json

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.cli import main
from mysql_syncer_spark.sources.catalog import load_table


@pytest.fixture()
def pair(spark, sf_dir, tmp_path):
    """master/ and slave/ dirs with a perturbed orders + extra table."""
    mdir, sdir = str(tmp_path / "master"), str(tmp_path / "slave")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    orders.write.parquet(f"{mdir}/orders.parquet")
    nation.write.parquet(f"{mdir}/nation.parquet")
    key = F.col("o_orderkey")
    (
        orders.where(key % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 11 == 0, F.col("o_totalprice") + 5)
            .otherwise(F.col("o_totalprice")),
        )
        .write.parquet(f"{sdir}/orders.parquet")
    )
    nation.write.parquet(f"{sdir}/zombie.parquet")
    return mdir, sdir


def run_cli(spark, argv):
    buf = io.StringIO()
    code = main(argv, spark=spark, out=buf)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    return code, lines


def test_plan_lists_all_actions(spark, pair):
    mdir, sdir = pair
    code, lines = run_cli(spark, ["plan", "--master", mdir, "--slave", sdir])
    assert code == 0
    actions = {l["table"]: l["action"] for l in lines}
    assert actions["orders"] == "diff_sync"
    assert actions["nation"] == "full_copy"   # missing on slave
    assert actions["zombie"] == "drop"        # excess on slave


def test_sync_converges_and_reports(spark, pair):
    mdir, sdir = pair
    code, lines = run_cli(spark, ["sync", "--master", mdir, "--slave", sdir])
    assert code == 0
    summary = lines[-1]["summary"]
    assert summary["errors"] == 0
    m = spark.read.parquet(f"{mdir}/orders.parquet")
    s = spark.read.parquet(f"{sdir}/orders.parquet")
    assert m.exceptAll(s).count() == 0 and s.exceptAll(m).count() == 0
    # second run: everything noop
    code2, lines2 = run_cli(spark, ["sync", "--master", mdir, "--slave", sdir])
    assert code2 == 0
    assert all(
        l["status"] == "noop" for l in lines2[:-1]
    ), lines2


def test_sync_table_touches_only_target(spark, pair):
    mdir, sdir = pair
    code, lines = run_cli(
        spark,
        ["sync-table", "--master", mdir, "--slave", sdir, "--table", "orders"],
    )
    assert code == 0
    assert [l["table"] for l in lines[:-1]] == ["orders"]
    m = spark.read.parquet(f"{mdir}/orders.parquet")
    s = spark.read.parquet(f"{sdir}/orders.parquet")
    assert m.exceptAll(s).count() == 0
    # the zombie table was NOT dropped by a single-table sync
    import os

    assert os.path.exists(f"{sdir}/zombie.parquet")


def test_sync_partition_restricts_scope(spark, pair):
    mdir, sdir = pair
    # perturbations exist across statuses; sync only status 'F'
    code, lines = run_cli(
        spark,
        ["sync-partition", "--master", mdir, "--slave", sdir,
         "--table", "orders", "--column", "o_orderstatus", "--value", "F"],
    )
    assert code == 0
    m = spark.read.parquet(f"{mdir}/orders.parquet")
    s = spark.read.parquet(f"{sdir}/orders.parquet")
    mf = m.where(F.col("o_orderstatus") == "F")
    sf = s.where(F.col("o_orderstatus") == "F")
    # the synced partition converged ...
    assert mf.exceptAll(sf).count() == 0 and sf.exceptAll(mf).count() == 0
    # ... and at least one other partition still differs (scope respected)
    rest_m = m.where(F.col("o_orderstatus") != "F")
    rest_s = s.where(F.col("o_orderstatus") != "F")
    assert rest_m.exceptAll(rest_s).count() > 0


def test_dry_run_mutates_nothing(spark, pair):
    mdir, sdir = pair
    before = spark.read.parquet(f"{sdir}/orders.parquet").count()
    code, lines = run_cli(
        spark, ["sync", "--master", mdir, "--slave", sdir, "--dry-run"]
    )
    assert code == 0
    after = spark.read.parquet(f"{sdir}/orders.parquet").count()
    assert before == after
    orders_line = [l for l in lines[:-1] if l.get("table") == "orders"][0]
    assert orders_line["status"] == "dry_run"
    assert orders_line["inserted"] > 0  # deltas counted, not applied


def test_ignore_flag_excludes(spark, pair):
    mdir, sdir = pair
    code, lines = run_cli(
        spark,
        ["plan", "--master", mdir, "--slave", sdir, "--ignore", "^orders$"],
    )
    assert code == 0
    assert "orders" not in {l["table"] for l in lines}


def test_unknown_table_errors(spark, pair):
    mdir, sdir = pair
    with pytest.raises(ValueError):
        run_cli(
            spark,
            ["sync-table", "--master", mdir, "--slave", sdir,
             "--table", "nope"],
        )


def test_index_build_and_ingest_cycle(spark, sf_dir, tmp_path):
    """index-build → ingest (admit + append) → re-ingest same batch
    admits nothing: the CLI face of the persisted-index daily job."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_p = str(tmp_path / "corpus.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    docs.where(F.col("doc_id") % 10 != 0).write.parquet(corpus_p)
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(batch_p)
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS clitest LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        code, lines = run_cli(spark, [
            "index-build", "--docs", corpus_p, "--name", "clitest.docs",
            "--num-hashes", "16", "--bands", "4", "--num-buckets", "4",
        ])
        assert code == 0 and lines[-1]["bands"] == 4

        out1 = str(tmp_path / "admitted1")
        code, lines = run_cli(spark, [
            "ingest", "--batch", batch_p, "--name", "clitest.docs",
            "--out", out1, "--threshold", "0.7", "--append",
        ])
        assert code == 0
        rep = lines[-1]
        assert rep["appended"] and 0 < rep["admitted_rows"] <= rep["batch_rows"]
        assert spark.read.parquet(out1).count() == rep["admitted_rows"]

        out2 = str(tmp_path / "admitted2")
        code, lines = run_cli(spark, [
            "ingest", "--batch", batch_p, "--name", "clitest.docs",
            "--out", out2, "--threshold", "0.7",
        ])
        assert code == 0 and lines[-1]["admitted_rows"] == 0
    finally:
        spark.sql("DROP DATABASE clitest CASCADE")


def test_compact_command(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag_cli")
    load_table(spark, sf_dir, "orders").repartition(32).write.parquet(path)
    buf = io.StringIO()
    rc = main(
        ["compact", "--path", path, "--target-mb", "128"],
        spark=spark, out=buf,
    )
    assert rc == 0
    stats = json.loads(buf.getvalue())
    assert stats["files_before"] >= 32 and stats["files_after"] == 1
    assert spark.read.parquet(path).count() > 0


def test_cli_digest(spark, sf_dir, tmp_path, capsys=None):
    """digest subcommand: commutative digest + MySQL-compat handshake."""
    import io
    import json as _json

    from mysql_syncer_spark.cli import main

    # orders has float columns -> compat mode must refuse; build an
    # int/string table for the compat check
    src = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c#d")], "id INT, v STRING"
    )
    path = str(tmp_path / "t.parquet")
    src.write.parquet(path)
    buf = io.StringIO()
    rc = main(
        ["digest", "--path", path, "--pk", "id", "--mysql-compat",
         "--mysql-table", "orders"],
        spark=spark, out=buf,
    )
    assert rc == 0
    rec = _json.loads(buf.getvalue())
    assert rec["row_count"] == 3
    assert len(rec["exact_digest"]) == 32
    # compat digest matches the library call byte-for-byte
    from mysql_syncer_spark.digest import (
        mysql_digest_query,
        table_digest_mysql_compat,
    )

    assert rec["mysql_compat_digest"] == table_digest_mysql_compat(
        spark.read.parquet(path), ["id"]
    )
    assert rec["mysql_query"] == mysql_digest_query(
        "orders", spark.read.parquet(path).columns, ["id"]
    )

    # without --mysql-compat: plain digests on any table
    buf2 = io.StringIO()
    rc2 = main(["digest", "--path", path], spark=spark, out=buf2)
    assert rc2 == 0
    rec2 = _json.loads(buf2.getvalue())
    assert rec2["exact_digest"] == rec["exact_digest"]


def test_cli_integrity(spark, tmp_path):
    """integrity subcommand: FK orphans + unique checks over a catalog
    dir, JSON report, --fail-on-violation exit code."""
    db = tmp_path / "intdb"
    db.mkdir()
    spark.createDataFrame([(1,), (2,)], "c_custkey long").write.parquet(
        str(db / "customer.parquet")
    )
    spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9), (12, 1)],
        "o_orderkey long, o_custkey long",
    ).write.parquet(str(db / "orders.parquet"))

    code, lines = run_cli(
        spark,
        ["integrity", "--db", str(db),
         "--fk", "orders.o_custkey=customer.c_custkey",
         "--unique", "orders.o_orderkey"],
    )
    assert code == 0
    rep = lines[0]["violations"]
    assert rep["orders.o_custkey->customer"] == 1   # key 9
    assert rep["orders.o_orderkey unique"] == 1     # key 12 twice

    code2, _ = run_cli(
        spark,
        ["integrity", "--db", str(db),
         "--fk", "orders.o_custkey=customer.c_custkey",
         "--fail-on-violation"],
    )
    assert code2 == 1

    # clean constraint set passes under --fail-on-violation
    code3, lines3 = run_cli(
        spark,
        ["integrity", "--db", str(db),
         "--unique", "customer.c_custkey", "--fail-on-violation"],
    )
    assert code3 == 0 and lines3[0]["violations"] == {
        "customer.c_custkey unique": 0
    }

    # no constraints -> usage exit 2
    code4, _ = run_cli(spark, ["integrity", "--db", str(db)])
    assert code4 == 2


def test_query_command_lists_and_runs(spark, sf_dir, tmp_path):
    # --list enumerates the registry
    code, lines = run_cli(spark, ["query", "--list"])
    assert code == 0
    names = {l["query"] for l in lines}
    assert "tpch_q1_pricing" in names and len(names) > 100
    # run one query, print JSON rows
    code, lines = run_cli(
        spark, ["query", "agg_pricing_summary", "--data", sf_dir,
                "--limit", "3"]
    )
    assert code == 0
    assert 1 <= len(lines) <= 3
    assert "l_returnflag" in lines[0]
    # full result to parquet
    dst = str(tmp_path / "qout.parquet")
    code, lines = run_cli(
        spark, ["query", "count_lineitem", "--data", sf_dir,
                "--out-parquet", dst]
    )
    assert code == 0 and lines[0]["rows"] == 1
    assert spark.read.parquet(dst).count() == 1


def test_query_command_errors(spark, sf_dir):
    code, lines = run_cli(spark, ["query", "no_such_query",
                                  "--data", sf_dir])
    assert code == 2 and "unknown query" in lines[0]["error"]
    code, lines = run_cli(spark, ["query", "count_lineitem"])
    assert code == 2 and "--data" in lines[0]["error"]


def test_scrub_cross_doc_and_benchmark(spark, tmp_path, capsys=None):
    import json as _json

    from mysql_syncer_spark.cli import main

    import random, string
    rng = random.Random(91)

    def rand(n):
        return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))

    shared = rand(40)
    docs = spark.createDataFrame(
        [(1, rand(30) + shared + rand(20)), (2, rand(15) + shared),
         (3, rand(80))],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out1 = str(tmp_path / "clean1")
    import io

    buf = io.StringIO()
    rc = main(
        ["scrub", "--docs", src, "--out", out1, "--k", "10"],
        spark=spark, out=buf,
    )
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip())
    assert rep["mode"] == "cross-doc" and rep["tier"] == "exact"
    assert rep["docs"] == 3 and rep["docs_touched"] == 2
    assert rep["chars_removed"] >= 80  # both copies cut
    cleaned = {r.doc_id: r.text_clean
               for r in spark.read.parquet(out1).collect()}
    assert shared not in cleaned[1] and shared not in cleaned[2]

    # benchmark mode, winnowed tier
    ref = spark.createDataFrame([(0, shared)], "ref_id long, text string")
    refp = str(tmp_path / "ref")
    ref.write.parquet(refp)
    out2 = str(tmp_path / "clean2")
    buf2 = io.StringIO()
    rc = main(
        ["scrub", "--docs", src, "--out", out2, "--reference", refp,
         "--k", "8", "--winnow", "4"],
        spark=spark, out=buf2,
    )
    assert rc == 0
    rep2 = _json.loads(buf2.getvalue().strip())
    assert rep2["mode"] == "benchmark" and rep2["tier"] == "winnowed"
    assert rep2["docs_touched"] == 2


def test_card_command_init_fold_show_and_reattach(spark, sf_dir, tmp_path):
    """card --init → --fold ×2 → --show equals the one-shot batch card
    of the full corpus (the E183 law through the CLI face), and the
    state re-attaches from files alone (fresh-session simulation via
    the database-copy trick — the CLI runs init and fold as separate
    processes)."""
    import shutil

    from mysql_syncer_spark.operators.text import (
        corpus_card,
        corpus_card_from_state,
        corpus_card_state_read,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_p = str(tmp_path / "corpus.parquet")
    b1_p = str(tmp_path / "b1.parquet")
    b2_p = str(tmp_path / "b2.parquet")
    m = F.col("doc_id") % 10
    docs.where(m < 8).write.parquet(corpus_p)
    docs.where(m == 8).write.parquet(b1_p)
    docs.where(m == 9).write.parquet(b2_p)
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS cardcli LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        code, lines = run_cli(spark, [
            "card", "--state", "cardcli.cc", "--init", corpus_p,
        ])
        assert code == 0 and lines[-1]["slices"] > 0
        code, lines = run_cli(spark, [
            "card", "--state", "cardcli.cc",
            "--fold", b1_p, "--fold", b2_p, "--show",
        ])
        assert code == 0
        got = sorted(
            (r["source"], r["lang"], r["n_docs"], r["dup_rate"],
             r["n_chars_total"], r["char_share"], r["n_ws_tokens"])
            for r in lines
        )
        full = sorted(
            (r.source, r.lang, r.n_docs, r.dup_rate,
             r.n_chars_total, r.char_share, r.n_ws_tokens)
            for r in corpus_card(docs, ["source", "lang"]).collect()
        )
        assert got == full

        # no-op invocation errors cleanly
        code, lines = run_cli(spark, ["card", "--state", "cardcli.cc"])
        assert code == 2 and "error" in lines[-1]

        # fresh-session simulation: copy the state files under a db the
        # catalog has no tables for; read must re-attach + re-bucket
        src = spark.catalog.getDatabase("cardcli").locationUri.replace(
            "file:", ""
        )
        dst = tmp_path / "wh2"
        shutil.copytree(src, dst)
        spark.sql(f"CREATE DATABASE cardre LOCATION '{dst}'")
        try:
            aggs, hashes = corpus_card_state_read(spark, "cardre.cc")
            re_card = sorted(
                (r.source, r.lang, r.n_docs, r.dup_rate,
                 r.n_chars_total, r.char_share, r.n_ws_tokens)
                for r in corpus_card_from_state(
                    aggs, ["source", "lang"]).collect()
            )
            assert re_card == full
            # the restored spec is real bucket metadata: the fold's
            # anti-join consumes it (a bare scan won't advertise it)
            from mysql_syncer_spark.operators.text import (
                corpus_card_fold_plan,
            )
            from mysql_syncer_spark.sources.bucketed import physical_plan

            batch = spark.createDataFrame(
                [("s", "en", "probe text")],
                "source string, lang string, text string",
            )
            prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = physical_plan(
                    corpus_card_fold_plan(
                        spark, "cardre.cc", batch, ["source", "lang"]
                    )
                )
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", prior
                )
            assert "Bucketed: true" in plan, plan
        finally:
            spark.sql("DROP DATABASE IF EXISTS cardre CASCADE")
    finally:
        spark.sql("DROP DATABASE cardcli CASCADE")
