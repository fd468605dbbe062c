"""Benchmark decontamination + repetition signal."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.contamination import (
    contamination,
    decontaminate,
    word_ngrams,
)
from mysql_syncer_spark.operators.text import with_repetition


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated training prose about spark engines"),
        (3, "answer: the quick brown fox jumps over the lazy dog today"),
        (4, "short doc"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def eval_set(spark):
    # the planted benchmark: shares a long span with docs 1 and 3
    rows = [(100, "quick brown fox jumps over the lazy dog")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_counts(corpus):
    g = word_ngrams(corpus, n=5)
    by_doc = {
        r["doc_id"]: r["n"]
        for r in g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # doc 1: 9 tokens -> 5 distinct 5-grams; doc 4 (<5 tokens) and the
    # empty doc 5 yield none
    assert by_doc[1] == 5
    assert 4 not in by_doc and 5 not in by_doc


def test_contamination_flags_planted_overlap(corpus, eval_set):
    flagged = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination(corpus, eval_set, n=5).collect()
    }
    # docs 1 and 3 contain the benchmark span; 2/4/5 are clean
    assert set(flagged) == {1, 3}
    # the 8-token eval doc has 4 distinct 5-grams, and both doc 1 (the
    # span as a suffix) and doc 3 (the span embedded) contain all 4
    assert flagged[1] == 4
    assert flagged[3] == 4


def test_decontaminate_drops_flagged(corpus, eval_set):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, eval_set, n=5).collect()
    )
    assert kept == [2, 4, 5]


def test_decontaminate_min_overlap_threshold(corpus, eval_set):
    # a threshold above the planted overlap keeps everything
    kept = decontaminate(corpus, eval_set, n=5, min_overlap=99)
    assert kept.count() == corpus.count()


def test_repetition_ratio(spark):
    rows = [
        (1, "spam spam spam spam spam"),   # 4 bigrams, 1 distinct
        (2, "all words here are unique"),  # 4 bigrams, 4 distinct
        (3, "one"),                        # no bigrams
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["rep_ratio"]
        for r in with_repetition(df, n=2).collect()
    }
    assert out[1] == pytest.approx(0.75)
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] == 0.0
