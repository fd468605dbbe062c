"""BPE tokenizer (operators/bpe.py): distributed training vs an
independent pure-Python reference, encode round-trip + invariants."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
)


# ---------------------------------------------------------------------
# independent reference trainer (textbook Sennrich et al. dict version)
# ---------------------------------------------------------------------

def _ref_word_counts(texts):
    counts = Counter()
    for t in texts:
        if t is None:
            continue
        norm = re.sub(r"\s+", " ", t.strip().lower())
        for w in norm.split(" "):
            if w:
                counts[w] += 1
    return counts


def _ref_train(texts, num_merges, min_freq=2):
    words = {}
    for w, c in _ref_word_counts(texts).items():
        syms = tuple(list(w[:-1]) + [w[-1] + EOW])
        words[syms] = words.get(syms, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        pairs = {p: n for p, n in pairs.items() if n >= min_freq}
        if not pairs:
            break
        # tie-break identical to the engine: count desc, then (a, b)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_words = {}
        for syms, c in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + c
        words = new_words
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "the lowly newt knew the lowdown",
    "low lower newer newest",
    None,
    "",
]


def test_train_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(df, num_merges=12, min_freq=2)
    want = _ref_train(TEXTS, 12, min_freq=2)
    assert got == want
    assert len(got) >= 8  # non-trivial on this corpus


def test_train_partitioning_independent(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    a = bpe_train(df, num_merges=6)
    b = bpe_train(df.repartition(7), num_merges=6)
    assert a == b


def test_greedy_overlap(spark):
    """'aaaa' with merge (a,a): greedy left-to-right pairs as
    ['aa','aa</w>']-style, never overlapping."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=1, min_freq=2)
    assert merges == [("a", "a")]
    out = bpe_encode(df, merges).first()
    # a a a a</w> -> aa aa</w>? no: last symbol is 'a</w>' (distinct
    # from 'a'), so greedy gives ['aa', 'a', 'a</w>']
    assert out["bpe_tokens"] == ["aa", "a", f"a{EOW}"] * 3


def test_encode_roundtrip_and_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    merges = bpe_train(docs, num_merges=30)
    enc = bpe_encode(docs, merges)
    rows = enc.collect()
    for r in rows:
        toks = r["bpe_tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # round-trip: joining tokens and stripping EOW reproduces the
        # normalized text
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        norm = re.sub(r"\s+", " ", (r["text"] or "").strip().lower())
        assert rebuilt == norm
        # every token is either a learned merge product or a base char
        vocab = {a + b for a, b in merges}
        for t in toks:
            base = t.replace(EOW, "")
            assert t in vocab or len(base) <= 1, t


def test_encode_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
           for r in bpe_encode(df, [("o", f"k{EOW}")]).collect()}
    assert got[1] == ([], 0)
    assert got[2] == ([], 0)
    assert got[3] == ([f"ok{EOW}"], 1)


def test_merges_compress(spark, sf_dir):
    """More merges => fewer tokens (monotone compression)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    m10 = bpe_train(docs, num_merges=10)
    m40 = bpe_train(docs, num_merges=40)
    n10 = bpe_encode(docs, m10).agg(F.sum("n_bpe_tokens")).first()[0]
    n40 = bpe_encode(docs, m40).agg(F.sum("n_bpe_tokens")).first()[0]
    assert m10 == m40[:10]  # training is prefix-stable
    assert n40 < n10


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(df, num_merges=0)
