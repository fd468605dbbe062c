"""Laws for operators/spans.py — exact-substring duplicated-span
extraction (Lee et al. 2022 semantics) and winnowing fingerprints
(Schleimer et al. 2003).

Exact tier is proven equal to a brute-force Python oracle on random
corpora; the winnowed tier is proven (a) position-exact against a
literal robust-winnowing reference implementation and (b) to honor
the published detection guarantee (every shared span of length
>= w+k-1 detected at EVERY alignment — the law fixed-stride sampling
cannot satisfy)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.spans import (
    duplicate_spans,
    kgram_positions,
    remove_duplicate_spans,
    winnow_fingerprints,
)


def _rand(rng, n):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def _brute_spans(docs, k, min_docs):
    """Literal restatement of the exact-substring-dedup definition."""
    from collections import defaultdict

    gd = defaultdict(set)
    for i, t in docs:
        t = t or ""
        for p in range(len(t) - k + 1):
            gd[t[p : p + k]].add(i)
    dup = {g for g, s in gd.items() if len(s) >= min_docs}
    out = []
    for i, t in docs:
        t = t or ""
        spans = []
        for p in range(len(t) - k + 1):
            if t[p : p + k] not in dup:
                continue
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k))
            else:
                spans.append((p, p + k))
        out.extend((i, s, e, e - s) for s, e in spans)
    return sorted(out)


def _mk_corpus(rng, n_docs=12, shared_lens=(25, 40), k=8):
    """Random corpus with planted shared spans at random alignments."""
    shared = [_rand(rng, L) for L in shared_lens]
    docs = []
    for i in range(n_docs):
        body = _rand(rng, rng.randint(0, 120))
        if i % 3 != 2:  # two thirds of docs carry a planted span
            s = shared[i % len(shared)]
            cut = rng.randint(0, len(body))
            body = body[:cut] + s + body[cut:]
        docs.append((i, body))
    docs.append((n_docs, None))
    docs.append((n_docs + 1, ""))
    return docs


class TestExactTier:
    def test_matches_bruteforce_random_corpora(self, spark):
        for seed in (1, 2, 3):
            rng = random.Random(seed)
            docs = _mk_corpus(rng)
            df = spark.createDataFrame(docs, "doc_id long, text string")
            for k in (5, 9):
                got = sorted(
                    tuple(r)
                    for r in duplicate_spans(df, k=k, min_docs=2).collect()
                )
                assert got == _brute_spans(docs, k, 2), (seed, k)

    def test_min_docs_threshold(self, spark):
        rng = random.Random(11)
        s = _rand(rng, 30)
        docs = [(i, _rand(rng, 20) + s + _rand(rng, 20)) for i in range(3)]
        docs.append((3, _rand(rng, 60)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        three = duplicate_spans(df, k=8, min_docs=3)
        assert sorted(r.doc_id for r in three.collect()) == [0, 1, 2]
        four = duplicate_spans(df, k=8, min_docs=4)
        assert four.count() == 0

    def test_kgram_positions_short_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, "abcd"), (2, None), (3, "ab")], "doc_id long, text string"
        )
        rows = kgram_positions(df, k=3).collect()
        assert sorted((r.doc_id, r.pos, r.gram) for r in rows) == [
            (1, 0, "abc"),
            (1, 1, "bcd"),
        ]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            duplicate_spans(df, k=5, min_docs=1)
        with pytest.raises(ValueError):
            kgram_positions(df, k=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(df, k=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(df, w=0)


class TestWinnowing:
    def _reference_select(self, hashes, w):
        """Literal robust winnowing: rightmost min of each window."""
        sel = set()
        for i in range(len(hashes) - w + 1):
            win = hashes[i : i + w]
            mn = min(win)
            q = max(j for j in range(w) if win[j] == mn)
            sel.add((i + q, hashes[i + q]))
        return sorted(sel)

    def test_selection_position_exact(self, spark):
        rng = random.Random(5)
        t = _rand(rng, 200)
        df = spark.createDataFrame([(1, t)], "doc_id long, text string")
        for k, w in ((8, 4), (12, 7), (5, 1)):
            got = sorted(
                (r.pos, r.fp)
                for r in winnow_fingerprints(df, k=k, w=w).collect()
            )
            hs = df.select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(t) - k)),
                    lambda i: F.xxhash64(
                        F.col("text").substr((i + 1).cast("int"), F.lit(k))
                    ),
                ).alias("h")
            ).collect()[0].h
            assert got == self._reference_select(hs, w), (k, w)

    def test_density_bound(self, spark):
        """Expected selected density is 2/(w+1); check a loose 2x band."""
        rng = random.Random(9)
        t = _rand(rng, 5000)
        df = spark.createDataFrame([(1, t)], "doc_id long, text string")
        k, w = 8, 9
        n_sel = winnow_fingerprints(df, k=k, w=w).count()
        m = len(t) - k + 1
        density = n_sel / m
        assert 1.0 / (w + 1) < density < 4.0 / (w + 1)

    def test_detection_guarantee_all_alignments(self, spark):
        """A shared span of length w+k-1 is detected at EVERY relative
        shift — the content-defined-sampling law that makes winnowing
        the correct scale path (fixed stride fails for shifts not
        0 mod stride)."""
        rng = random.Random(13)
        k, w = 6, 4
        shared = _rand(rng, w + k - 1)  # minimal guaranteed length
        base = _rand(rng, 40) + shared + _rand(rng, 40)
        docs = [(0, base)]
        for shift in range(1, 8):
            docs.append((shift, _rand(rng, 40 + shift) + shared + _rand(rng, 30)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        spans = duplicate_spans(df, k=k, min_docs=2, winnow_w=w).collect()
        by_doc = {r.doc_id for r in spans}
        assert by_doc == set(range(8))
        # every reported span overlaps the planted region (fuzz bound)
        fuzz = w + k - 1
        for r in spans:
            lo = 40 + (r.doc_id if r.doc_id else 0)
            assert r.span_start < lo + len(shared) + fuzz
            assert r.span_end > lo - fuzz

    def test_no_false_positives_on_disjoint_corpus(self, spark):
        """Unique random docs (no shared k-grams) report nothing in
        either tier."""
        rng = random.Random(17)
        alpha = string.ascii_lowercase + string.ascii_uppercase + string.digits
        docs = [
            (i, "".join(rng.choice(alpha) for _ in range(150)))
            for i in range(6)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        assert duplicate_spans(df, k=12, min_docs=2).count() == 0
        assert duplicate_spans(df, k=12, min_docs=2, winnow_w=5).count() == 0


class TestScrub:
    def test_scrub_equals_python_cut(self, spark):
        rng = random.Random(21)
        docs = _mk_corpus(rng)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        k = 7
        spans = {}
        for d, s, e, _ in _brute_spans(docs, k, 2):
            spans.setdefault(d, []).append((s, e))
        out = {
            r.doc_id: (r.text_clean, r.n_chars_removed)
            for r in remove_duplicate_spans(df, k=k, min_docs=2).collect()
        }
        assert set(out) == {d for d, _ in docs}
        for d, t in docs:
            if t is None:
                assert out[d] == (None, 0)
                continue
            cut, cur = "", 0
            for s, e in sorted(spans.get(d, [])):
                cut += t[cur:s]
                cur = e
            cut += t[cur:]
            removed = sum(e - s for s, e in spans.get(d, []))
            assert out[d] == (cut, removed), d

    def test_every_row_survives(self, spark, sf_dir):
        documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = remove_duplicate_spans(documents, k=30, min_docs=2)
        assert out.count() == documents.count()
        assert "text_clean" in out.columns and "n_chars_removed" in out.columns


class TestSpanIndex:
    """Persisted winnowed-fingerprint index: O(batch) incremental
    exact-substring dedup (the E45 economics for spans)."""

    K, W = 8, 4

    @pytest.fixture(scope="class")
    def corpus_batch(self, spark):
        rng = random.Random(42)
        shared = _rand(rng, 30)
        corpus = [
            (i, _rand(rng, 50) + (shared if i % 2 == 0 else "") + _rand(rng, 40))
            for i in range(10)
        ]
        bshared = _rand(rng, 25)
        batch = [
            (100, _rand(rng, 20) + shared + _rand(rng, 20)),  # dups corpus
            (101, _rand(rng, 90)),  # unique
            (102, _rand(rng, 10) + bshared + _rand(rng, 10)),  # batch-batch
            (103, _rand(rng, 33) + bshared),
        ]
        return (
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(batch, "doc_id long, text string"),
        )

    @pytest.fixture(scope="class")
    def idx(self, spark, corpus_batch, tmp_path_factory):
        from mysql_syncer_spark.operators.spans import ensure_span_index

        loc = tmp_path_factory.mktemp("spanidx_wh")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS spanidxtest LOCATION '{loc}'")
        yield ensure_span_index(
            corpus_batch[0], "spanidxtest.docs", k=self.K, w=self.W,
            num_buckets=4,
        )
        spark.sql("DROP DATABASE spanidxtest CASCADE")

    def test_against_index_equals_full_recompute(
        self, spark, corpus_batch, idx
    ):
        """The contract: O(batch) against-index == full winnowed
        recompute over corpus ∪ batch, restricted to batch ids."""
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_against_index,
        )

        corpus, batch = corpus_batch
        got = sorted(
            tuple(r)
            for r in duplicate_spans_against_index(batch, idx).collect()
        )
        full = duplicate_spans(
            corpus.unionByName(batch), k=self.K, min_docs=2, winnow_w=self.W
        )
        exp = sorted(
            tuple(r) for r in full.where("doc_id >= 100").collect()
        )
        assert got == exp and got, got

    def test_append_then_detect(self, spark, corpus_batch, idx):
        """Appended batch content is duplicate-detectable by the NEXT
        batch (read back fresh — the bucketed append is real)."""
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_against_index,
            span_index_append,
            span_index_read,
        )

        _, batch = corpus_batch
        span_index_append("spanidxtest.docs", batch, idx)
        idx2 = span_index_read(spark, "spanidxtest.docs")
        rng = random.Random(9)
        b1_text = batch.where("doc_id = 102").first().text
        nxt = spark.createDataFrame(
            [(200, _rand(rng, 5) + b1_text[5:30] + _rand(rng, 8))],
            "doc_id long, text string",
        )
        hits = duplicate_spans_against_index(nxt, idx2).collect()
        assert hits and all(r.doc_id == 200 for r in hits)

    def test_parameter_mismatch_raises(self, spark, corpus_batch, idx):
        from mysql_syncer_spark.operators.spans import ensure_span_index

        with pytest.raises(ValueError, match="parameter-distinct"):
            ensure_span_index(
                corpus_batch[0], "spanidxtest.docs", k=self.K + 1, w=self.W
            )

    def test_corpus_side_never_refingerprinted(
        self, spark, corpus_batch, idx
    ):
        """Plan gate: the against-index join scans the bucketed _fps
        table (bucket-aware, no corpus Exchange) and the winnowing
        transform runs ONLY on the batch side."""
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_against_index,
        )
        from mysql_syncer_spark.sources.bucketed import physical_plan

        _, batch = corpus_batch
        plan = physical_plan(duplicate_spans_against_index(batch, idx))
        assert "docs_fps" in plan, plan
        assert "Bucketed: true" in plan, plan
        # the winnowing selector (xxhash64 over substr) appears only for
        # the batch subtrees, never over the index scan: the full
        # recompute plan has strictly more of them
        full_plan = physical_plan(
            duplicate_spans(
                corpus_batch[0].unionByName(batch),
                k=self.K,
                min_docs=2,
                winnow_w=self.W,
            )
        )
        marker = "xxhash64(substr("
        assert plan.count(marker) <= full_plan.count(marker), (
            plan.count(marker),
            full_plan.count(marker),
        )


class TestDuplicationProfile:
    def test_matches_bruteforce(self, spark):
        from mysql_syncer_spark.operators.spans import duplication_profile

        rng = random.Random(31)
        docs = _mk_corpus(rng)
        k = 7
        # brute reference
        from collections import defaultdict

        gd = defaultdict(set)
        for i, t in docs:
            t = t or ""
            for p in range(len(t) - k + 1):
                gd[t[p : p + k]].add(i)
        dup = {g for g, s in gd.items() if len(s) >= 2}
        exp = {}
        for i, t in docs:
            t = t or ""
            grams = [t[p : p + k] for p in range(len(t) - k + 1)]
            nd = sum(1 for g in grams if g in dup)
            exp[i] = (
                len(grams),
                nd,
                round(nd / max(len(grams), 1), 6),
            )
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_fraction)
            for r in duplication_profile(df, k=k).collect()
        }
        assert got == exp

    def test_every_doc_reported(self, spark):
        from mysql_syncer_spark.operators.spans import duplication_profile

        df = spark.createDataFrame(
            [(1, None), (2, "short"), (3, "x" * 50)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_grams, r.dup_fraction)
            for r in duplication_profile(df, k=20).collect()
        }
        assert got == {1: (0, 0.0), 2: (0, 0.0), 3: (31, 0.0)}


class TestNoveltyAgainstIndex:
    def test_known_vs_fresh(self, spark, tmp_path):
        from mysql_syncer_spark.operators.spans import (
            ensure_span_index,
            novelty_against_index,
        )

        rng = random.Random(41)
        corpus_docs = [(i, _rand(rng, 120)) for i in range(8)]
        cdf = spark.createDataFrame(corpus_docs, "doc_id long, text string")
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS novidx "
            f"LOCATION '{tmp_path / 'wh'}'"
        )
        try:
            idx = ensure_span_index(cdf, "novidx.docs", k=8, w=4,
                                    num_buckets=4)
            batch = spark.createDataFrame(
                [
                    (100, corpus_docs[0][1]),          # verbatim copy
                    (101, _rand(rng, 120)),            # fresh
                    (102, corpus_docs[1][1][:60] + _rand(rng, 60)),  # half
                    (103, "tiny"),                     # too short
                ],
                "doc_id long, text string",
            )
            got = {
                r.doc_id: r
                for r in novelty_against_index(batch, idx).collect()
            }
            assert got[100].known_fraction == 1.0
            assert got[101].known_fraction == 0.0 and got[101].n_fps > 0
            assert 0.2 < got[102].known_fraction < 0.8
            assert got[103].n_fps == 0 and got[103].known_fraction == 0.0
        finally:
            spark.sql("DROP DATABASE IF EXISTS novidx CASCADE")


class TestSpansBetween:
    """Bipartite spans: benchmark decontamination at span granularity."""

    def _fixture(self, spark):
        rng = random.Random(77)
        bench_q = _rand(rng, 50)
        corpus = [
            (1, _rand(rng, 40) + bench_q + _rand(rng, 40)),
            (2, _rand(rng, 100)),
            (3, bench_q),
            (4, None),
        ]
        ref = [(0, bench_q), (1, _rand(rng, 60))]
        return (
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(ref, "ref_id long, text string"),
            corpus,
        )

    def test_exact_spans_and_scrub(self, spark):
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_between,
            scrub_spans_between,
        )

        cdf, rdf, corpus = self._fixture(spark)
        got = sorted(
            tuple(r)
            for r in duplicate_spans_between(cdf, rdf, k=10).collect()
        )
        assert got == [(1, 40, 90, 50), (3, 0, 50, 50)], got
        sc = {
            r.doc_id: (r.text_clean, r.n_chars_removed)
            for r in scrub_spans_between(cdf, rdf, k=10).collect()
        }
        assert sc[1] == (corpus[0][1][:40] + corpus[0][1][90:], 50)
        assert sc[2] == (corpus[1][1], 0)
        assert sc[3] == ("", 50)
        assert sc[4] == (None, 0)

    def test_winnowed_detects_at_any_alignment(self, spark):
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_between,
        )

        rng = random.Random(81)
        k, w = 6, 4
        q = _rand(rng, k + w - 1)  # minimal guaranteed length
        ref = spark.createDataFrame([(0, q)], "ref_id long, text string")
        docs = [
            (i, _rand(rng, 30 + i) + q + _rand(rng, 20)) for i in range(6)
        ]
        cdf = spark.createDataFrame(docs, "doc_id long, text string")
        hit_docs = {
            r.doc_id
            for r in duplicate_spans_between(
                cdf, ref, k=k, winnow_w=w
            ).collect()
        }
        assert hit_docs == set(range(6))

    def test_clean_corpus_reports_nothing(self, spark):
        from mysql_syncer_spark.operators.spans import (
            duplicate_spans_between,
        )

        rng = random.Random(83)
        cdf = spark.createDataFrame(
            [(i, _rand(rng, 80)) for i in range(4)],
            "doc_id long, text string",
        )
        rdf = spark.createDataFrame(
            [(0, _rand(rng, 80))], "ref_id long, text string"
        )
        assert duplicate_spans_between(cdf, rdf, k=15).count() == 0
        assert (
            duplicate_spans_between(cdf, rdf, k=15, winnow_w=5).count() == 0
        )
