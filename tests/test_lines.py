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


class TestRepeatedWindows:
    def test_shifted_boilerplate_caught(self, spark):
        """The tiled scrub misses a duplicate shifted by one token;
        the sliding-window scrub removes it from both docs."""
        from mysql_syncer_spark.operators.lines import (
            remove_repeated_spans,
            remove_repeated_windows,
        )

        boiler = " ".join(f"b{i}" for i in range(8))
        rows = [
            (1, "u1 " + boiler + " t1"),          # boiler at offset 1
            (2, "v1 v2 " + boiler + " t2"),       # boiler at offset 2
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # tiled 8-token spans: offsets disagree -> nothing matches
        tiled = remove_repeated_spans(
            df, span_tokens=8, min_docs=2
        ).collect()
        assert all(r["n_spans_removed"] == 0 for r in tiled)
        # sliding windows at stride 1 find the common 8-gram
        out = {
            r["doc_id"]: r
            for r in remove_repeated_windows(
                df, window_tokens=8, stride=1, min_docs=2
            ).collect()
        }
        assert out[1]["text_clean"] == "u1 t1"
        assert out[2]["text_clean"] == "v1 v2 t2"
        assert out[1]["n_tokens_removed"] == 8

    def test_short_docs_pass_through(self, spark):
        from mysql_syncer_spark.operators.lines import (
            remove_repeated_windows,
        )

        rows = [(1, "a b c"), (2, "a b c"), (3, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in remove_repeated_windows(
                df, window_tokens=8, stride=4, min_docs=2
            ).collect()
        }
        # shorter than the window: no windows, untouched
        assert out[1]["text_clean"] == "a b c"
        assert out[1]["n_tokens_removed"] == 0
        assert out[3]["text_clean"] == "" and out[3]["n_tokens"] == 0

    def test_overlapping_flags_union_not_double_count(self, spark):
        """Two overlapping frequent windows cover a UNION of tokens —
        counts reflect covered positions, not window sums."""
        from mysql_syncer_spark.operators.lines import (
            remove_repeated_windows,
        )

        # 12 shared tokens -> windows at starts 0 and 4 both frequent
        # (stride 4, window 8); union covers tokens 0..11
        shared = " ".join(f"s{i}" for i in range(12))
        rows = [(1, shared + " x"), (2, shared + " y")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in remove_repeated_windows(
                df, window_tokens=8, stride=4, min_docs=2
            ).collect()
        }
        assert out[1]["n_tokens_removed"] == 12
        assert out[1]["text_clean"] == "x"

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.lines import (
            remove_repeated_windows,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="stride"):
            remove_repeated_windows(df, window_tokens=4, stride=5)
        with pytest.raises(ValueError, match="min_docs"):
            remove_repeated_windows(df, min_docs=1)
