"""Model-based quality scorer (operators/classifier.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
    weak_labels_from_gopher,
)

GOOD = (
    "the project report describes how the team designed and tested a "
    "distributed system for processing large data sets with careful "
    "attention to fault tolerance and performance measurements over "
    "the full year of operation and the results show steady progress "
    "in throughput and latency across all of the deployed regions"
)
BAD = "$$$ ### @@@ 111 ### $$$ zzz ### !!! ### %%% ### &&& *** ###"


@pytest.fixture(scope="module")
def model_and_data(spark):
    rows = []
    for i in range(40):
        rows.append((i, GOOD + f" extra token{i}", 1.0))
    for i in range(40, 80):
        rows.append((i, BAD + f" ${i}", 0.0))
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = train_quality_classifier(labeled, num_features=1 << 12)
    return model, labeled


def test_separates_planted_docs(spark, model_and_data):
    model, _ = model_and_data
    probe = spark.createDataFrame(
        [
            (1, GOOD + " final report summary"),
            (2, BAD + " $99"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_score"]
           for r in score_quality(probe, model).collect()}
    assert got[1] > 0.8
    assert got[2] < 0.2
    assert 0.0 <= got[3] <= 1.0  # NULL scores, never crashes
    assert got[1] > got[3]


def test_training_is_deterministic(spark, model_and_data):
    model, labeled = model_and_data
    again = train_quality_classifier(labeled, num_features=1 << 12)
    probe = labeled.select("doc_id", "text")
    a = {r["doc_id"]: r["quality_score"]
         for r in score_quality(probe, model).collect()}
    b = {r["doc_id"]: r["quality_score"]
         for r in score_quality(probe, again).collect()}
    assert a == b


def test_weak_labels_and_distilled_ranking(spark, sf_dir):
    """Bootstrap labels from the Gopher rules, train, and check the
    learned score AGREES with the teacher on clear cases while giving
    a graded ranking."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = weak_labels_from_gopher(docs)
    assert set(labeled.columns) == set(docs.columns) | {"label"}
    n_pos = labeled.where(F.col("label") == 1.0).count()
    assert 0 < n_pos < labeled.count()  # both classes present
    model = train_quality_classifier(labeled, num_features=1 << 12)
    scored = score_quality(labeled.select("doc_id", "text", "label"), model)
    # mean score of teacher-positive docs must exceed teacher-negative
    means = {
        r["label"]: r["m"]
        for r in scored.groupBy("label")
        .agg(F.avg("quality_score").alias("m"))
        .collect()
    }
    assert means[1.0] > means[0.0] + 0.2
    # scores are graded, not a binary copy of the teacher
    n_distinct = scored.select("quality_score").distinct().count()
    assert n_distinct > 10


def test_model_round_trip(spark, model_and_data, tmp_path):
    from pyspark.ml import PipelineModel

    model, labeled = model_and_data
    path = str(tmp_path / "qmodel")
    model.save(path)
    loaded = PipelineModel.load(path)
    probe = labeled.select("doc_id", "text").limit(10)
    a = [r["quality_score"] for r in score_quality(probe, model).collect()]
    b = [r["quality_score"] for r in score_quality(probe, loaded).collect()]
    assert a == b
