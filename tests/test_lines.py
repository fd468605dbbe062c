"""Cross-document repeated-span removal (operators/lines.py)."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.lines import remove_repeated_spans

BOILER = "cookie notice please accept all cookies to continue"  # 8 tokens
UNIQ = [
    "alpha bravo charlie delta echo foxtrot golf hotel",
    "india juliet kilo lima mike november oscar papa",
    "quebec romeo sierra tango uniform victor whiskey xray",
]


@pytest.fixture(scope="module")
def docs(spark):
    # three docs sharing an 8-token boilerplate prefix + unique tails,
    # one pristine doc, one empty, one NULL
    rows = [
        (0, f"{BOILER} {UNIQ[0]}"),
        (1, f"{BOILER} {UNIQ[1]}"),
        (2, f"{BOILER} {UNIQ[2]}"),
        (3, "totally original text nine words long here indeed yes"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_everywhere(docs):
    out = remove_repeated_spans(docs, span_tokens=8, min_docs=2)
    got = {r["doc_id"]: r for r in out.collect()}
    # the shared first span is scrubbed from all three carriers; the
    # unique tail spans survive verbatim
    for i in range(3):
        assert got[i]["text_clean"] == UNIQ[i]
        assert got[i]["n_spans"] == 2
        assert got[i]["n_spans_removed"] == 1


def test_unique_and_degenerate_docs_pass_through(docs):
    out = remove_repeated_spans(docs, span_tokens=8, min_docs=2)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[3]["text_clean"] == (
        "totally original text nine words long here indeed yes"
    )
    assert got[3]["n_spans_removed"] == 0
    # empty and NULL docs survive as '' with zero spans
    for i in (4, 5):
        assert got[i]["text_clean"] == ""
        assert got[i]["n_spans"] == 0
        assert got[i]["n_spans_removed"] == 0
    assert out.count() == docs.count()


def test_min_docs_threshold(docs):
    # at min_docs=4 the 3-document boilerplate is below threshold:
    # nothing is removed anywhere
    out = remove_repeated_spans(docs, span_tokens=8, min_docs=4)
    assert out.agg(F.sum("n_spans_removed")).first()[0] == 0


def test_order_and_partitioning_independent(docs):
    a = remove_repeated_spans(docs, span_tokens=8, min_docs=2)
    b = remove_repeated_spans(
        docs.repartition(7).sortWithinPartitions(F.col("doc_id").desc()),
        span_tokens=8,
        min_docs=2,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_intra_doc_repeat_not_counted_as_cross_doc(spark):
    # a span repeated twice WITHIN one doc has document frequency 1 —
    # it must NOT be scrubbed (df counts distinct docs, not occurrences)
    span = "one two three four"
    df = spark.createDataFrame(
        [(0, f"{span} {span}")], "doc_id long, text string"
    )
    out = remove_repeated_spans(df, span_tokens=4, min_docs=2)
    row = out.first()
    assert row["n_spans_removed"] == 0
    assert row["text_clean"] == f"{span} {span}"


def test_validation():
    with pytest.raises(ValueError):
        remove_repeated_spans(None, span_tokens=0)
    with pytest.raises(ValueError):
        remove_repeated_spans(None, min_docs=1)
