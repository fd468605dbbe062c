

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
