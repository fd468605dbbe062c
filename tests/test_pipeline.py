"""End-to-end curation pipeline (pipeline.py) + its CLI command."""

import io
import json

from pyspark.sql import functions as F

from mysql_syncer_spark.cli import main
from mysql_syncer_spark.pipeline import (
    CurationReport,
    curate_and_export,
    curate_corpus,
    read_curated,
)

FLUENT = (
    "the quick brown foxes jumped over the lazy sleeping dogs today "
    "while the careful readers watched from under a shady old tree "
    "and the gentle river carried small wooden boats toward the sea"
)


def _docs(spark):
    rows = [
        (0, FLUENT),
        (1, FLUENT),                      # exact dup of 0
        (2, FLUENT + " extra"),           # near-dup (Hamming 3), longer
        (3, "too short"),                 # fails quality
        (4, FLUENT.replace("river", "brook")),  # near-dup of 0
        (5, "contact me at alice@example.com today please because " + FLUENT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages(spark):
    rep = CurationReport()
    out = curate_corpus(
        _docs(spark), min_words=20, redact_pii=True, report=rep
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert rep.docs_in == 6
    assert rep.after_quality == 5          # doc 3 dropped
    assert rep.after_exact_dedup == 4      # doc 1 (exact dup) dropped
    # near-dups {0,2,4} collapse; keep-BEST keeps the LONGEST (doc 2)
    assert rep.after_near_dedup == 2
    assert set(got) == {2, 5}
    # PII redacted in surviving text
    assert "alice@example.com" not in got[5]["text"]
    assert "<EMAIL>" in got[5]["text"]
    # every survivor carries a split
    assert all(r["split"] in ("train", "val", "test") for r in got.values())


def test_curate_stage_skips(spark):
    rep = CurationReport()
    out = curate_corpus(
        _docs(spark),
        min_words=0,
        near_dup_max_bits=0,
        redact_pii=False,
        report=rep,
    )
    # no quality gate, no near-dup: only the exact dup goes
    assert rep.after_quality == rep.docs_in == 6
    assert rep.after_near_dedup == rep.after_exact_dedup == 5
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "alice@example.com" in texts[5]  # PII untouched


def test_export_layout_and_pruned_read(spark, tmp_path):
    path = str(tmp_path / "curated")
    rep = curate_and_export(
        _docs(spark), path, min_words=20, n_shards=2
    )
    assert sum(rep.splits.values()) == rep.after_near_dedup == 2
    assert sum(s["n_rows"] for s in rep.shards) == 2
    back = read_curated(spark, path)
    assert back.count() == 2
    # split + shard both landed as partition columns
    assert {"split", "shard"} <= set(back.columns)
    one_split = next(iter(rep.splits))
    assert read_curated(spark, path, split=one_split).count() == rep.splits[
        one_split
    ]


def test_cli_curate_command(spark, sf_dir, tmp_path):
    docs_src = f"{sf_dir}/documents.parquet"
    out_dir = str(tmp_path / "export")
    buf = io.StringIO()
    rc = main(
        [
            "curate",
            "--docs", docs_src,
            "--out", out_dir,
            "--min-words", "10",
            "--n-shards", "4",
            "--splits", "train=0.8,val=0.2",
        ],
        spark=spark,
        out=buf,
    )
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["docs_in"] > 0
    assert rep["after_near_dedup"] <= rep["after_exact_dedup"] <= rep[
        "after_quality"
    ] <= rep["docs_in"]
    assert set(rep["splits"]) <= {"train", "val"}
    disk = spark.read.parquet(out_dir)
    assert disk.count() == sum(rep["splits"].values())
    assert disk.where(F.col("shard") >= 4).count() == 0
