

class TestPMICollocations:
    """PMI collocations (E138): hand-computed PMI values, the
    independence baseline (pmi == 0), the min_count variance guard,
    tokenization edge cases, validation."""

    def test_hand_computed_pmi(self, spark):
        import math

        from mysql_syncer_spark.operators.text import pmi_collocations

        # bigram table: (x,y) x2 and (a,b) x2 -> N=4; each slot
        # marginal is 2, so pmi = ln(2*4 / (2*2)) = ln 2 for both
        df = spark.createDataFrame(
            [("x y",), ("x y",), ("a b",), ("a b",)], "text string"
        )
        rows = pmi_collocations(df, min_count=1, k=10).collect()
        got = {(r["w1"], r["w2"]): (r["n_xy"], r["pmi"]) for r in rows}
        assert got == {
            ("a", "b"): (2, round(math.log(2), 6)),
            ("x", "y"): (2, round(math.log(2), 6)),
        }

    def test_independence_scores_zero(self, spark):
        """A pair occurring exactly as often as independence of its
        slots predicts has PMI 0: bigrams (a,b),(a,c),(d,b),(d,c) ->
        every pair n_xy=1, nx=2, ny=2, N=4 -> ln(4/4)=0."""
        from mysql_syncer_spark.operators.text import pmi_collocations

        df = spark.createDataFrame(
            [("a b",), ("a c",), ("d b",), ("d c",)], "text string"
        )
        rows = pmi_collocations(df, min_count=1, k=10).collect()
        assert len(rows) == 4
        assert all(r["pmi"] == 0.0 for r in rows)

    def test_min_count_guard(self, spark):
        from mysql_syncer_spark.operators.text import pmi_collocations

        # the rare (q,z) pair would dominate PMI; min_count excludes it
        df = spark.createDataFrame(
            [("q z",)] + [("a b",)] * 5 + [("a c",)] * 5, "text string"
        )
        rows = pmi_collocations(df, min_count=2, k=10).collect()
        pairs = {(r["w1"], r["w2"]) for r in rows}
        assert ("q", "z") not in pairs and ("a", "b") in pairs

    def test_short_docs_and_normalization(self, spark):
        from mysql_syncer_spark.operators.text import pmi_collocations

        # <2-token docs contribute nothing; case/whitespace normalize
        df = spark.createDataFrame(
            [("solo",), ("",), ("  A   b ",), ("a b",)], "text string"
        )
        rows = pmi_collocations(df, min_count=2, k=10).collect()
        assert [(r["w1"], r["w2"], r["n_xy"]) for r in rows] == [
            ("a", "b", 2)
        ]

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.text import pmi_collocations

        df = spark.createDataFrame([("a b",)], "text string")
        with _pytest.raises(ValueError, match="min_count"):
            pmi_collocations(df, min_count=0)
        with _pytest.raises(ValueError, match="k must"):
            pmi_collocations(df, k=0)


class TestCorpusCard:
    """E180 corpus-card rollup laws (operators/text.py)."""

    def test_counts_dup_rate_and_share(self, spark):
        from mysql_syncer_spark.operators.text import corpus_card

        rows = [
            ("web", "en", "hello world"),
            ("web", "en", "hello world"),      # exact dup
            ("web", "en", "unique text here"),
            ("web", "de", "hallo welt"),
            ("book", "en", ""),                # empty text: 0 ws tokens
        ]
        df = spark.createDataFrame(rows, "source string, lang string, text string")
        out = {(r.source, r.lang): r for r in corpus_card(
            df, ["source", "lang"]).collect()}
        wen = out[("web", "en")]
        assert wen.n_docs == 3
        assert abs(wen.dup_rate - (1 - 2 / 3)) < 1e-6  # rounded to 6 dp
        assert wen.n_ws_tokens == 2 + 2 + 3
        assert out[("book", "en")].n_ws_tokens == 0
        assert out[("book", "en")].dup_rate == 0.0
        # shares sum to 1 over non-empty-total slices
        total_share = sum(r.char_share for r in out.values())
        assert abs(total_share - 1.0) < 1e-6


class TestCorpusCardIncremental:
    """E183 incremental corpus-card laws (operators/text.py)."""

    def test_fold_equals_recompute_and_cross_batch_dups(self, spark):
        from mysql_syncer_spark.operators.text import (
            corpus_card,
            corpus_card_apply_batch,
            corpus_card_from_state,
            corpus_card_state,
        )

        b1 = spark.createDataFrame(
            [("web", "en", "hello world"), ("web", "en", "unique one")],
            "source string, lang string, text string",
        )
        # batch 2: a cross-batch exact dup ("hello world"), a batch-
        # internal dup pair, and a NEW slice entering via the batch
        b2 = spark.createDataFrame(
            [
                ("web", "en", "hello world"),
                ("web", "en", "twice twice"),
                ("web", "en", "twice twice"),
                ("book", "de", "neu hier"),
            ],
            "source string, lang string, text string",
        )
        aggs, hashes = corpus_card_state(b1, ["source", "lang"])
        aggs, hashes = corpus_card_apply_batch(
            aggs, hashes, b2, ["source", "lang"]
        )
        folded = corpus_card_from_state(aggs, ["source", "lang"])
        full = corpus_card(b1.unionByName(b2), ["source", "lang"])
        key = ["source", "lang"]
        f = {tuple(r[k] for k in key): r.asDict() for r in folded.collect()}
        g = {tuple(r[k] for k in key): r.asDict() for r in full.collect()}
        # fold == recompute on every shared column (mean_chars is an
        # exact-int-sum mean in both)
        for slice_key, row in g.items():
            for col in ("n_docs", "dup_rate", "n_chars_total",
                        "char_share", "n_ws_tokens"):
                assert f[slice_key][col] == row[col], (slice_key, col)
        # the cross-batch dup and the batch-internal pair both counted:
        # web/en has 5 docs, 3 distinct texts
        wen = f[("web", "en")]
        assert wen["n_docs"] == 5
        assert abs(wen["dup_rate"] - (1 - 3 / 5)) < 1e-6
        # the new slice entered through the fold
        assert ("book", "de") in f

    def test_null_texts_fold_equals_recompute(self, spark):
        """ADVICE r11: NULL text hashes to NULL; a NULL key never
        matches in the anti-join, so before the r12 fix every batch
        containing one re-counted it as a new distinct (and grew the
        hash table with (group, NULL) rows) while corpus_card's
        countDistinct ignores NULLs. The fold ≡ recompute law must
        hold on NULL-text rows, across MULTIPLE batches."""
        from mysql_syncer_spark.operators.text import (
            corpus_card,
            corpus_card_apply_batch,
            corpus_card_from_state,
            corpus_card_state,
        )

        schema = "source string, lang string, text string"
        b1 = spark.createDataFrame(
            [("web", "en", None), ("web", "en", "alpha")], schema
        )
        b2 = spark.createDataFrame(
            [("web", "en", None), ("web", "en", "beta")], schema
        )
        b3 = spark.createDataFrame([("web", "en", None)], schema)
        aggs, hashes = corpus_card_state(b1, ["source", "lang"])
        for b in (b2, b3):
            aggs, hashes = corpus_card_apply_batch(
                aggs, hashes, b, ["source", "lang"]
            )
        # the hash table never accumulates NULL keys
        assert hashes.where("__h IS NULL").count() == 0
        folded = {
            (r.source, r.lang): r.asDict()
            for r in corpus_card_from_state(
                aggs, ["source", "lang"]
            ).collect()
        }
        full = {
            (r.source, r.lang): r.asDict()
            for r in corpus_card(
                b1.unionByName(b2).unionByName(b3), ["source", "lang"]
            ).collect()
        }
        assert folded.keys() == full.keys()
        for k, row in full.items():
            for col in ("n_docs", "dup_rate", "n_chars_total",
                        "char_share", "n_ws_tokens"):
                assert folded[k][col] == row[col], (k, col)
