"""Text analysis operators over the documents fixture."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.text import (
    with_fingerprints,
    with_lang_id,
    with_quality,
    with_token_counts,
)


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_counts(spark, documents):
    out = with_token_counts(documents)
    row = out.select("text", "n_tokens_ws", "n_tokens_bpe").first()
    assert row["n_tokens_ws"] == len(row["text"].split())
    assert out.where(F.col("n_tokens_ws") <= 0).count() == 0
    # degenerate inputs
    edge = spark.createDataFrame([("",), ("   ",), ("a b",)], "text string")
    rows = {r["text"]: r["n_tokens_ws"] for r in with_token_counts(edge).collect()}
    assert rows[""] == 0 and rows["   "] == 0 and rows["a b"] == 2


def test_quality(documents):
    out = with_quality(documents)
    bad = out.where(
        (F.col("quality_score") < 0) | (F.col("quality_score") > 1)
    ).count()
    assert bad == 0
    assert out.where(F.col("punct_ratio") > 0.5).count() == 0  # word salad


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and a dog"),
            (2, "der hund ist nicht ein katze und die maus"),
            (3, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in with_lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),      # same after normalization
            (3, "world hello"),      # same bag, different order
        ],
        "doc_id long, text string",
    )
    out = with_fingerprints(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["fp_exact"] == by_id[2]["fp_exact"]
    assert by_id[1]["fp_exact"] != by_id[3]["fp_exact"]
    assert by_id[1]["fp_bag"] == by_id[3]["fp_bag"]


def test_pii_redaction_planted(spark):
    from mysql_syncer_spark.operators.text import with_pii

    rows = [
        (1, "mail a@b.co or 10.0.0.1 call +1 (555) 123-4567 now"),
        (2, "no pii here at all"),
        (3, "double jane.doe@corp.example.com and john@x.io"),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in with_pii(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["redacted"] == "mail <EMAIL> or <IP> call <PHONE> now"
    assert out[1]["n_pii"] == 3
    assert out[2]["n_pii"] == 0 and out[2]["redacted"] == rows[1][1]
    assert out[3]["redacted"] == "double <EMAIL> and <EMAIL>"
    assert out[3]["n_pii"] == 2
    assert out[4]["n_pii"] == 0


def test_tfidf_topk_ranks_distinctive_terms(spark):
    from mysql_syncer_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "common zebra"),
            (2, "common quark"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # the doc-unique term beats the corpus-wide one despite lower tf
    assert top[1] == "zebra" and top[2] == "quark"
    assert top[3] == "common"


def test_tfidf_topk_k_bound_and_empty_docs(spark):
    from mysql_syncer_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["term"])
    assert len(by_doc.get(1, [])) == 2
    # blank/NULL docs contribute no terms (and no rows)
    assert 2 not in by_doc and 3 not in by_doc


def test_gopher_rules_flags(spark):
    from mysql_syncer_spark.operators.text import with_gopher_rules

    long_good = "the of " + "quick brown foxes jumped over the lazy sleeping dogs today " * 6
    # same length/shape but only ONE distinct stopword, repeated — the
    # paper's rule needs >= 2 DISTINCT stop words, so repeats must fail
    one_stop = "the the " + "quick brown foxes jumped over the lazy sleeping dogs today " * 6
    rows = [
        (0, long_good.strip()),          # passes everything
        (1, "short doc the and of"),     # fails word count
        (2, "### " * 10 + long_good.strip()),  # symbol-heavy
        (3, None),                       # NULL → all rules false
        (4, ""),                         # empty → word count false
        (5, one_stop.strip()),           # fails DISTINCT-stopword rule
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_gopher_rules(df, min_words=30)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["gopher_keep"] is True
    assert got[1]["rule_word_count"] is False
    assert got[1]["gopher_keep"] is False
    assert got[2]["rule_symbol_ratio"] is False
    assert got[5]["rule_stopwords"] is False   # 'the' repeated ≠ 2 distinct
    assert got[5]["rule_word_count"] is True   # fails ONLY on stopwords
    assert got[5]["gopher_keep"] is False
    assert all(
        got[3][k] is False
        for k in got[3]
        if k.startswith("rule_") or k == "gopher_keep"
    )
    assert got[4]["rule_word_count"] is False


def test_gopher_line_rules(spark):
    from mysql_syncer_spark.operators.text import with_gopher_rules

    body = "the quick brown foxes jumped over the lazy sleeping dogs today " * 6
    bullets = "\n".join(f"- item {i} here now" for i in range(5))
    ellipses = "\n".join(f"the thing number {i} trails off..." for i in range(10))
    df = spark.createDataFrame(
        [
            (0, body + "\nplain second line of the doc"),
            (1, bullets + "\n" + body),   # 5/6 bullet lines = 0.83 <= 0.9
            (2, "\n".join(["- b"] * 19) + "\n" + body),  # 19/20 = 0.95 > 0.9
            (3, ellipses + "\n" + body),  # 10/11 ellipsis lines > 0.3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in with_gopher_rules(df).collect()}
    assert got[0]["rule_bullet_lines"] is True
    assert got[0]["rule_ellipsis_lines"] is True
    assert got[1]["rule_bullet_lines"] is True
    assert got[2]["rule_bullet_lines"] is False
    assert got[3]["rule_ellipsis_lines"] is False


def test_unigram_logprob_orders_gibberish_below_fluent(spark):
    from mysql_syncer_spark.operators.text import with_unigram_logprob

    common = "the cat and the dog sat on the mat in the sun " * 4
    rows = [
        (0, common.strip()),
        (1, common.strip()),
        (2, common.strip()),
        (3, "zxqv jkwpf mmtrx qqyzb wvxcc pltnn"),  # corpus-unique junk
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_unigram_logprob(df)
    got = {r["doc_id"]: r for r in out.collect()}
    # fluent docs share high-frequency tokens; gibberish tokens each
    # occur once in the corpus → far lower mean logprob
    assert got[3]["logprob"] < got[0]["logprob"]
    assert got[0]["logprob"] == got[1]["logprob"] == got[2]["logprob"]
    # degenerate docs survive with zero tokens and NULL score
    for i in (4, 5):
        assert got[i]["n_tokens"] == 0 and got[i]["logprob"] is None
    assert out.count() == df.count()


def test_winsorize_clamps_and_flags(spark):
    from mysql_syncer_spark.operators.text import winsorize

    vals = list(range(1, 100)) + [10_000, None]  # one wild outlier + NULL
    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in enumerate(vals)],
        "id long, v double",
    )
    out = winsorize(df, "v", 0.01, 0.99)
    rows = {r["id"]: r for r in out.collect()}
    hi = max(r["v_w"] for r in rows.values() if r["v_w"] is not None)
    assert hi < 10_000  # outlier clamped to the p99 cut
    assert rows[99]["clipped"] is True
    assert rows[50]["clipped"] is False and rows[50]["v_w"] == rows[50]["v"]
    # NULL passes through unclamped and unflagged
    assert rows[100]["v_w"] is None and rows[100]["clipped"] is False
    assert out.count() == df.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)


def test_vocab_divergence_flags_planted_drift(spark):
    from mysql_syncer_spark.operators.text import vocab_divergence

    base = "the cat and the dog sat near the tree in the sun"
    a = spark.createDataFrame(
        [(i, base) for i in range(20)], "doc_id long, text string"
    )
    # snapshot B: same distribution + a flood of new boilerplate
    b_rows = [(i, base) for i in range(20)] + [
        (100 + i, "cookiebanner cookiebanner cookiebanner accept")
        for i in range(10)
    ]
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    top = vocab_divergence(a, b, k=3).collect()
    assert top[0]["term"] == "cookiebanner"
    assert top[0]["c_a"] == 0 and top[0]["c_b"] == 30
    assert top[0]["js_contrib"] > 0
    # identical snapshots: divergence contributions ~0
    same = vocab_divergence(a, a, k=3).collect()
    assert all(abs(r["js_contrib"]) < 1e-9 for r in same)


def test_bigram_logprob_order_sensitivity(spark):
    """The point of the bigram over the unigram signal: a scrambled
    doc of common words must score LOWER than fluent repetition of
    the same transitions, while the unigram model can't tell them
    apart."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.text import (
        with_bigram_logprob,
        with_unigram_logprob,
    )

    # corpus: 20 fluent docs establishing common transitions, one
    # scrambled doc whose transitions are each corpus-rare. (With a
    # tiny corpus the scrambled doc must NOT repeat internally, or its
    # own repetitions make its transitions corpus-frequent too.)
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"  # same words, odd order
    rows = [(i, fluent) for i in range(10, 30)]
    rows += [(1, fluent), (2, scrambled),
             (3, "x"), (4, None), (5, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bg = {r["doc_id"]: (r["n_bigrams"], r["logprob"])
          for r in with_bigram_logprob(docs).collect()}
    # short/NULL/empty docs: zero bigrams, NULL score
    assert bg[3] == (0, None) and bg[4] == (0, None) and bg[5] == (0, None)
    assert bg[1][0] == bg[2][0] > 0
    # unigram scores tie (identical bag of words)
    ug = {r["doc_id"]: r["logprob"]
          for r in with_unigram_logprob(docs).collect()}
    assert abs(ug[1] - ug[2]) < 0.05
    # bigram separates them decisively
    assert bg[1][1] > bg[2][1] + 0.5


def test_bigram_logprob_hand_computed(spark):
    """Exact probabilities on a tiny corpus: 'a b a b' + 'a b'.
    Bigrams: (a,b) x3, (b,a) x1; ctx a=3, b=1 so p(b|a)=1, p(a|b)=1.
    Doc 1 mean log10 = (0 + 0 + 0)/3 ... all transitions certain
    except none — every bigram present with certainty 3/3 and 1/1."""
    import math

    from mysql_syncer_spark.operators.text import with_bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob"])
           for r in with_bigram_logprob(docs).collect()}
    # corpus counts: (a,b)=3, (b,a)=1; ctx a: 3, ctx b: 1
    # doc1 bigrams: (a,b),(b,a),(a,b) -> lps: log10(3/3), log10(1/1),
    # log10(3/3) = 0 -> mean 0
    assert got[1] == (3, 0.0)
    assert got[2] == (1, 0.0)


def test_bigram_logprob_partitioning_independent(spark, sf_dir):
    from mysql_syncer_spark.operators.text import with_bigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r["doc_id"], r["n_bigrams"], r["logprob"])
         for r in with_bigram_logprob(docs).collect()}
    b = {(r["doc_id"], r["n_bigrams"], r["logprob"])
         for r in with_bigram_logprob(docs.repartition(17)).collect()}
    assert a == b
