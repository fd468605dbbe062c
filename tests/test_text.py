

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


class TestCorpusCardPersistedState:
    """E183 production form: catalog-table state (bucketed hash table,
    append-only) — fold law + the exchange-free scale property."""

    def test_persisted_fold_equals_recompute(self, spark):
        from mysql_syncer_spark.operators.text import (
            corpus_card,
            corpus_card_from_state,
            corpus_card_state_fold,
            corpus_card_state_read,
            corpus_card_state_write,
        )

        name = "cc_state_law"
        schema = "source string, lang string, text string"
        base = spark.createDataFrame(
            [
                ("web", "en", "hello world"),
                ("web", "en", "unique one"),
                ("web", "de", "hallo welt"),
            ],
            schema,
        )
        b1 = spark.createDataFrame(
            [
                ("web", "en", "hello world"),   # cross-batch dup
                ("web", "en", "fresh text"),
                ("book", "de", "neu hier"),     # new slice
                ("web", "en", None),            # NULL text
            ],
            schema,
        )
        b2 = spark.createDataFrame(
            [
                ("web", "en", "fresh text"),    # dup of b1's NEW hash
                ("book", "de", "zweiter band"),
            ],
            schema,
        )
        try:
            corpus_card_state_write(base, ["source", "lang"], name,
                                    num_buckets=4)
            for b in (b1, b2):
                corpus_card_state_fold(spark, name, b,
                                       ["source", "lang"], num_buckets=4)
            aggs, hashes = corpus_card_state_read(spark, name)
            assert hashes.where("__h IS NULL").count() == 0
            # append-only table holds exactly the distinct non-NULL
            # hashes of the full corpus (no duplicate rows)
            assert (hashes.count()
                    == hashes.select("source", "lang", "__h")
                             .distinct().count())
            folded = {
                (r.source, r.lang): r.asDict()
                for r in corpus_card_from_state(
                    aggs, ["source", "lang"]).collect()
            }
            full = {
                (r.source, r.lang): r.asDict()
                for r in corpus_card(
                    base.unionByName(b1).unionByName(b2),
                    ["source", "lang"]).collect()
            }
            assert folded.keys() == full.keys()
            for k, row in full.items():
                for col in ("n_docs", "dup_rate", "n_chars_total",
                            "char_share", "n_ws_tokens"):
                    assert folded[k][col] == row[col], (k, col)
        finally:
            for suf in ("_aggs", "_hashes"):
                spark.sql(f"DROP TABLE IF EXISTS {name}{suf}")

    def test_fold_plan_state_side_is_exchange_free(self, spark):
        """The scale claim, asserted on the PLAN: the corpus-sized
        hash table is scanned bucketed with no Exchange — only the
        O(batch) side of the anti-join shuffles."""
        from mysql_syncer_spark.operators.text import (
            corpus_card_fold_plan,
            corpus_card_state_write,
        )
        from mysql_syncer_spark.sources.bucketed import physical_plan

        name = "cc_state_plan"
        schema = "source string, lang string, text string"
        base = spark.createDataFrame(
            [("web", "en", f"doc number {i}") for i in range(64)], schema
        )
        batch = spark.createDataFrame(
            [("web", "en", f"doc number {i}") for i in range(60, 70)],
            schema,
        )
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            corpus_card_state_write(base, ["source", "lang"], name,
                                    num_buckets=4)
            # at test size the optimizer would broadcast the tiny state
            # table; disable broadcast to surface the at-scale shape
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = physical_plan(
                corpus_card_fold_plan(spark, name, batch,
                                      ["source", "lang"])
            )
            assert "Bucketed: true" in plan, plan
            # walk the tree branch ABOVE the state scan: no Exchange
            # may sit between the bucketed scan and the anti-join
            tree = plan.split("\n\n")[0]
            lines = tree.splitlines()
            scan_i = next(
                i for i, ln in enumerate(lines)
                if "Scan parquet" in ln and f"{name}_hashes" in ln
            )

            def marker_col(ln):
                for m in ("+- ", ":- "):
                    if m in ln:
                        return ln.index(m)
                return -1

            depth = marker_col(lines[scan_i])
            ancestors = []
            for ln in reversed(lines[:scan_i]):
                c = marker_col(ln)
                if 0 <= c < depth:
                    ancestors.append(ln)
                    depth = c
                if c == 0:
                    break
            branch = [ln for ln in ancestors if "Join" not in ln]
            assert not any("Exchange" in ln for ln in branch), (
                ancestors, plan
            )
            # and the join itself is the non-broadcast anti form
            assert any(
                "Join" in ln and "LeftAnti" in ln for ln in ancestors
            ), ancestors
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
            for suf in ("_aggs", "_hashes"):
                spark.sql(f"DROP TABLE IF EXISTS {name}{suf}")


class TestNgramDiversity:
    """E189 type-token-ratio laws (operators/text.py)."""

    def test_hand_computed(self, spark):
        from mysql_syncer_spark.operators.text import ngram_diversity

        rows = [
            ("s1", "a b a b"),       # uni: 4 tok / 2 types; bi: 3 / 2
            ("s1", "a b c"),         # uni: 3 / 3; bi: 2 / 2 (a b dup)
            ("s2", "x"),             # uni: 1 / 1; no bigrams
            ("s3", ""),              # empty: no tokens at all
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        out = {
            r.source: r
            for r in ngram_diversity(df, ["source"]).collect()
        }
        s1 = out["s1"]
        assert (s1.n_tokens, s1.n_types) == (7, 3)
        assert abs(s1.ttr - 3 / 7) < 1e-6
        # bigrams: 'a b','b a','a b' + 'a b','b c' -> 5 total, 3 types
        assert (s1.n_bigrams, s1.n_bigram_types) == (5, 3)
        assert abs(s1.bigram_ttr - 0.6) < 1e-6
        s2 = out["s2"]
        assert (s2.n_tokens, s2.n_bigrams) == (1, 0)
        assert s2.bigram_ttr is None
        assert "s3" not in out  # no tokens -> no unigram row

    def test_templated_text_collapses_bigram_ttr_only(self, spark):
        from mysql_syncer_spark.operators.text import ngram_diversity

        # same unigram vocabulary; one source stamps a template
        tpl = [("t", "the quick brown fox jumps")] * 20
        var = [
            ("v", " ".join(ws)) for ws in [
                ["the", "quick", "brown", "fox", "jumps"],
                ["quick", "the", "fox", "brown", "jumps"],
                ["brown", "jumps", "the", "quick", "fox"],
                ["fox", "brown", "jumps", "the", "quick"],
                ["jumps", "fox", "quick", "brown", "the"],
            ] * 4
        ]
        df = spark.createDataFrame(
            tpl + var, "source string, text string"
        )
        from mysql_syncer_spark.operators.text import ngram_diversity as nd
        out = {r.source: r for r in nd(df, ["source"]).collect()}
        assert out["t"].ttr == out["v"].ttr  # same vocab grain
        assert out["t"].bigram_ttr < out["v"].bigram_ttr  # template shows


class TestZipfFit:
    """E192 Zipf-fit laws (operators/text.py)."""

    def test_exact_power_law_alpha_one(self, spark):
        from mysql_syncer_spark.operators.text import zipf_fit

        # counts c_r = 60/r for ranks 1..5: ln c = ln 60 - 1*ln r —
        # a PERFECT alpha=1 fit (r2 == 1)
        words = []
        for r, w in enumerate(["w1", "w2", "w3", "w4", "w5"], 1):
            words += [w] * (60 // r)
        df = spark.createDataFrame(
            [("en", " ".join(words))], "lang string, text string"
        )
        row = zipf_fit(df, ["lang"], top_k=5).first()
        assert row.n_top == 5
        assert abs(row.zipf_alpha - 1.0) < 1e-6
        assert abs(row.r2 - 1.0) < 1e-6
        import math
        assert abs(row.intercept - math.log(60)) < 1e-6

    def test_uniform_counts_alpha_zero(self, spark):
        from mysql_syncer_spark.operators.text import zipf_fit

        df = spark.createDataFrame(
            [("en", "a b c d a b c d a b c d")],
            "lang string, text string",
        )
        row = zipf_fit(df, ["lang"], top_k=4).first()
        assert row.zipf_alpha == 0.0   # flat head: no decay

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.text import zipf_fit

        df = spark.createDataFrame([("en", "a")], "lang string, text string")
        with _pytest.raises(ValueError, match="top_k"):
            zipf_fit(df, ["lang"], top_k=2)
