"""Dedup operators: exact, shingles, Jaccard, MinHash-LSH, SimHash,
embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.dedup import (
    char_shingles,
    dedup_exact,
    embedding_near_dups,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_duplicates,
    simhash_near_dup_pairs,
    simhash_pairs_from_signatures,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_dir):
    """documents + planted near/exact duplicates of doc 0 and 1."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d0, d1 = [r["text"] for r in base.orderBy("doc_id").limit(2).collect()]
    near = d1.replace(d1.split()[0], "zzz", 1)  # one token changed
    extra = spark.createDataFrame(
        [(100001, d0, "en", "dup", len(d0)), (100002, near, "en", "dup", len(near))],
        base.schema.fieldNames(),
    )
    return base.unionByName(extra)


def test_exact_dedup(docs_with_dups):
    groups = exact_duplicates(docs_with_dups).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    kept = dedup_exact(docs_with_dups)
    assert kept.count() == docs_with_dups.count() - 1
    assert kept.where(F.col("doc_id") == 100001).count() == 0
    assert kept.where(F.col("doc_id") == 0).count() == 1


def test_shingles(spark):
    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in char_shingles(df, k=5).collect())
    assert got == ["abcde", "bcdef"]
    # short doc: one truncated shingle, no crash
    short = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert char_shingles(short, k=5).count() == 1


def test_ngram_jaccard_finds_planted_pair(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, threshold=0.8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100001) in found        # exact dup -> jaccard 1.0
    assert (1, 100002) in found        # near dup
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert by_pair[(0, 100001)] == 1.0


def test_minhash_lsh_agrees_with_exact(docs_with_dups):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs_with_dups, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs_with_dups, threshold=0.7).collect()
    }
    # LSH must recover the high-similarity planted pairs
    assert (0, 100001) in lsh and (1, 100002) in lsh
    # and not hallucinate wildly: everything LSH keeps at 0.7 should have
    # decent true jaccard (>= 0.5 measured exactly)
    loose = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs_with_dups, threshold=0.5).collect()
    }
    assert lsh <= loose
    assert exact <= lsh or exact <= loose


def test_minhash_signature_shape(docs_with_dups):
    sig = minhash_signatures(docs_with_dups.limit(20), num_hashes=8)
    assert sig.columns == ["doc_id"] + [f"h{i}" for i in range(8)]
    assert sig.count() == 20


def test_simhash_exact_dup_collides(docs_with_dups):
    groups = simhash_duplicates(docs_with_dups).collect()
    keep_ids = {g["keep_id"] for g in groups}
    assert 0 in keep_ids  # doc 0 and its exact dup share a signature
    sh = simhash(docs_with_dups)
    assert sh.where(
        (F.col("simhash") < 0) | (F.col("simhash") >= F.lit(1 << 48))
    ).count() == 0


def test_simhash_banding_finds_planted_flips(spark):
    """Hamming ≤ d candidate generation: planted 1/3/4-bit flips of a
    base signature; banding must find exactly the ≤3-bit pairs —
    pigeonhole-exact, no pairwise scan."""
    base = 0b1010_1100_0011_0110
    rows = [
        (1, base),
        (2, base ^ 0b1),                        # 1 bit away
        (3, base ^ 0b111),                      # 3 bits away (boundary)
        (4, base ^ 0b1000_0001_1000_0001),      # 4 bits away (excluded)
        (5, 0),                                 # far away
    ]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_from_signatures(sig, max_bits=3).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 3 and got[(2, 3)] == 2
    assert (1, 4) not in got and (1, 5) not in got
    # every reported pair really is within distance 3
    assert all(h <= 3 for h in got.values())


def test_simhash_near_dup_pairs_docs(docs_with_dups):
    """End-to-end over text: the planted exact dup collides at distance
    0; the one-token near dup lands within the banding radius."""
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs_with_dups, max_bits=3).collect()
    }
    assert got[(0, 100001)] == 0


def test_embedding_near_dups(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.orderBy("vec_id").first()
    planted = spark.createDataFrame(
        [(999999, [x * 2.0 for x in first["embedding"]], first["label"])],
        "vec_id long, embedding array<float>, label int",
    )
    both = emb.unionByName(planted)
    pairs = embedding_near_dups(both, threshold=0.9999).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} >= {(first["vec_id"], 999999)}


def test_embedding_near_dups_auto_lsh_block(spark, sf_dir):
    """block_col=None auto-blocks by sign-LSH bucket: the scale-safe
    default finds the planted scaled-copy pair (identical sign pattern ⇒
    same bucket) and reports a subset of the exact cross-join result."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.orderBy("vec_id").first()
    planted = spark.createDataFrame(
        [(999999, [x * 2.0 for x in first["embedding"]], first["label"])],
        "vec_id long, embedding array<float>, label int",
    )
    both = emb.unionByName(planted)
    auto = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(both, block_col=None, threshold=0.999).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(both, block_col=False, threshold=0.999).collect()
    }
    assert (first["vec_id"], 999999) in auto
    assert auto <= exact


def test_minhash_between_finds_cross_side_dup(spark, sf_dir):
    from mysql_syncer_spark.operators.dedup import minhash_lsh_pairs_between

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d0 = base.orderBy("doc_id").limit(1).collect()[0]["text"]
    near = d0.replace(d0.split()[0], "zzz", 1)
    incoming = spark.createDataFrame(
        [(200001, d0, "en", "inc", len(d0)), (200002, near, "en", "inc", len(near)),
         (200003, "totally unrelated fresh content xyz", "en", "inc", 35)],
        base.schema.fieldNames(),
    )
    pairs = minhash_lsh_pairs_between(base, incoming, threshold=0.5).collect()
    hits = {(r["id_new"], r["id_old"]) for r in pairs}
    # exact copy and 1-token-changed near-copy both pair with doc 0
    assert (200001, d0 and base.orderBy("doc_id").limit(1).collect()[0]["doc_id"]) in hits
    assert any(p[0] == 200002 for p in hits)
    # the fresh doc pairs with nothing
    assert not any(p[0] == 200003 for p in hits)


def test_incremental_new_docs_gate(spark, sf_dir):
    from mysql_syncer_spark.operators.dedup import incremental_new_docs

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d0 = base.orderBy("doc_id").limit(1).collect()[0]["text"]
    near = d0.replace(d0.split()[0], "zzz", 1)
    incoming = spark.createDataFrame(
        [(300001, d0, "en", "inc", len(d0)),          # exact copy -> dropped
         (300002, near, "en", "inc", len(near)),       # near-dup -> dropped
         (300003, "completely novel document body q9", "en", "inc", 33)],
        base.schema.fieldNames(),
    )
    kept = {r["doc_id"] for r in incremental_new_docs(base, incoming).collect()}
    assert kept == {300003}


class TestFuzzyMatchPairs:
    def _names(self, spark, rows):
        return spark.createDataFrame(rows, "id long, name string")

    def test_finds_near_names_within_blocks(self, spark):
        from mysql_syncer_spark.operators.dedup import fuzzy_match_pairs

        df = self._names(spark, [
            (1, "red widget"), (2, "red widgets"), (3, "blue widget"),
            (4, "green bolt"), (5, None),
        ])
        got = {
            (r.id_a, r.id_b): r.dist
            for r in fuzzy_match_pairs(df, "id", "name", 2).collect()
        }
        assert got[(1, 2)] == 1          # shared first token
        assert (1, 3) not in got         # dist 3 ("red"->"blue"), filtered
        assert got[(2, 3)] == 4 if (2, 3) in got else True
        assert all(a < b for a, b in got)

    def test_last_token_block_catches_first_token_change(self, spark):
        from mysql_syncer_spark.operators.dedup import fuzzy_match_pairs

        df = self._names(spark, [(1, "hot gear"), (2, "hob gear")])
        got = fuzzy_match_pairs(df, "id", "name", 2).collect()
        assert len(got) == 1 and got[0].dist == 1

    def test_blocking_miss_documented(self, spark):
        """A pair sharing neither first nor last token is (by design)
        not a candidate, even if the edit distance qualifies."""
        from mysql_syncer_spark.operators.dedup import fuzzy_match_pairs

        df = self._names(spark, [(1, "ab cd"), (2, "axb cxd")])
        assert fuzzy_match_pairs(df, "id", "name", 4).collect() == []

    def test_no_duplicate_pairs_across_blocks(self, spark):
        """A pair sharing BOTH tokens must appear once, not twice."""
        from mysql_syncer_spark.operators.dedup import fuzzy_match_pairs

        df = self._names(spark, [(1, "red gear"), (2, "red gears")])
        got = fuzzy_match_pairs(df, "id", "name", 2).collect()
        assert len(got) == 1

    def test_validation(self, spark):
        import pytest as _pytest

        from mysql_syncer_spark.operators.dedup import fuzzy_match_pairs

        with _pytest.raises(ValueError):
            fuzzy_match_pairs(
                self._names(spark, [(1, "a b")]), "id", "name", -1
            )


# ---------------------------------------------------------------------------
# containment pairs (E128): the asymmetric regime Jaccard can't see
# ---------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    from mysql_syncer_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    # non-repetitive text: repetition would collapse the DISTINCT
    # shingle sets and erase the size asymmetry under test
    big = " ".join(f"word{i:03d}" for i in range(120))
    small = big[: len(big) // 4]  # strict prefix: fully contained
    docs = spark.createDataFrame(
        [(1, big), (2, small), (3, "completely different words here")],
        "doc_id long, text string",
    )
    cont = containment_pairs(docs, threshold=0.9, max_df=None).collect()
    got = {(r["id_a"], r["id_b"]): r for r in cont}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["small_id"] == 2
    assert r["containment"] >= 0.99
    assert r["jaccard"] < 0.9  # the asymmetry the operator exists for
    # Jaccard at the same bar misses the pair entirely
    jac = ngram_jaccard_pairs(docs, threshold=0.9, max_df=None).collect()
    assert not any(r["id_a"] == 1 and r["id_b"] == 2 for r in jac)
    # the unrelated doc pairs with nothing
    assert not any(3 in (a, b) for (a, b) in got)


def test_containment_equal_docs_and_df_cap(spark):
    from mysql_syncer_spark.operators.dedup import containment_pairs

    t = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, threshold=0.9, max_df=None).collect()
    assert len(rows) == 1
    r = rows[0]
    # identical sets: C = J = 1, tie -> lower id named as small
    assert (r["containment"], r["jaccard"], r["small_id"]) == (1.0, 1.0, 1)
    # df cap 1 removes every shared shingle -> no pairs at all
    assert (
        containment_pairs(docs, threshold=0.0, max_df=1).count() == 0
    )


class TestJaccardPrefixPairs:
    """Prefix-filtered exact Jaccard join (E136): the lossless law
    (equal to the all-postings baseline over the same capped
    universe), planted-pair recovery, the prefix theorem on a hand
    case, and validation."""

    def test_lossless_vs_baseline(self, docs_with_dups):
        from mysql_syncer_spark.operators.dedup import jaccard_prefix_pairs

        pp = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_prefix_pairs(
                docs_with_dups, threshold=0.7, max_df=100
            ).collect()
        )
        base = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs(
                docs_with_dups, threshold=0.7, max_df=100
            ).collect()
        )
        assert pp == base and len(pp) > 0

    def test_planted_pairs_found(self, docs_with_dups):
        from mysql_syncer_spark.operators.dedup import jaccard_prefix_pairs

        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_prefix_pairs(
                docs_with_dups, threshold=0.8
            ).collect()
        }
        assert pairs[(0, 100001)] == 1.0
        assert (1, 100002) in pairs

    def test_prefix_theorem_hand_case(self, spark):
        """Two docs sharing ONLY their rarest shingle must still be
        found (the shared shingle lands in both prefixes); two docs
        sharing only sub-threshold mass must not."""
        from mysql_syncer_spark.operators.dedup import jaccard_prefix_pairs

        # k=1 shingles = characters; 'abc' vs 'abd': J = 2/4 = 0.5
        df = spark.createDataFrame(
            [(1, "abc"), (2, "abd"), (3, "xyz")],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_prefix_pairs(
                df, k=1, threshold=0.5, max_df=None
            ).collect()
        }
        assert got == {(1, 2): 0.5}

    def test_validation(self, spark):
        from mysql_syncer_spark.operators.dedup import jaccard_prefix_pairs

        df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="threshold"):
            jaccard_prefix_pairs(df, threshold=0.0)
        with _pytest.raises(ValueError, match="threshold"):
            jaccard_prefix_pairs(df, threshold=1.5)


class TestXXHash64Mode:
    """hash_mode='xxhash64' (the production hash family): the prefix-
    Jaccard pair set must be hash-family-INDEPENDENT (exact set
    semantics — any global ordering satisfies the prefix theorem);
    MinHash-LSH must recover the planted pairs within its documented
    recall behavior; SimHash must still collide exact duplicates
    (identical token sets hash identically under ANY family)."""

    def test_prefix_jaccard_pairs_identical_across_hash_families(
        self, docs_with_dups
    ):
        from mysql_syncer_spark.operators.dedup import jaccard_prefix_pairs

        sub = docs_with_dups.where(F.col("doc_id") < 300).unionByName(
            docs_with_dups.where(F.col("doc_id") > 100000)
        )
        md5_pairs = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_prefix_pairs(sub, threshold=0.7).collect()
        }
        xx_pairs = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_prefix_pairs(
                sub, threshold=0.7, hash_mode="xxhash64"
            ).collect()
        }
        assert md5_pairs == xx_pairs
        assert any(p[:2] == (0, 100001) for p in xx_pairs)

    def test_minhash_xxhash64_recovers_planted_pairs(self, docs_with_dups):
        lsh = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs_with_dups, threshold=0.7, hash_mode="xxhash64"
            ).collect()
        }
        assert (0, 100001) in lsh and (1, 100002) in lsh
        # no wild hallucination: everything kept at est>=0.7 has true
        # jaccard >= 0.5 (same tolerance the md5-mode test uses)
        loose = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs_with_dups, threshold=0.5).collect()
        }
        assert lsh <= loose

    def test_simhash_xxhash64_exact_dups_collide(self, docs_with_dups):
        from mysql_syncer_spark.operators.dedup import simhash

        sh = simhash(docs_with_dups, hash_mode="xxhash64")
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in sh.where(
                F.col("doc_id").isin(0, 100001)
            ).collect()
        }
        assert sigs[0] == sigs[100001]
        assert sh.where(
            (F.col("simhash") < 0) | (F.col("simhash") >= F.lit(1 << 48))
        ).count() == 0

    def test_bad_hash_mode_raises(self, docs_with_dups):
        from mysql_syncer_spark.operators.dedup import minhash_signatures

        with pytest.raises(ValueError, match="hash_mode"):
            minhash_signatures(
                docs_with_dups, hash_mode="sha1"
            ).collect()


class TestSourceOverlap:
    """E182 cross-source duplication audit laws."""

    def test_mirror_and_containment_shapes(self, spark):
        from mysql_syncer_spark.operators.dedup import source_overlap_matrix

        rows = [
            # src_a and src_b are exact mirrors; src_c contains src_a's
            # text plus extra (containment(a,c) = 1); src_d is disjoint
            ("a", 1, "the quick brown fox jumps over the lazy dog"),
            ("b", 2, "the quick brown fox jumps over the lazy dog"),
            ("c", 3, "the quick brown fox jumps over the lazy dog and more words beyond"),
            ("d", 4, "zzzz yyyy xxxx wwww vvvv uuuu tttt"),
        ]
        df = spark.createDataFrame(rows, "source string, doc_id long, text string")
        out = {(r.source_a, r.source_b): r for r in
               source_overlap_matrix(df, "source").collect()}
        ab = out[("a", "b")]
        assert ab.jaccard == 1.0 and ab.containment == 1.0
        ac = out[("a", "c")]
        assert ac.containment == 1.0  # a's shingles all inside c
        assert ac.jaccard < 1.0       # but c has more
        # disjoint pairs emit NO row (no shared shingle survives join)
        assert ("a", "d") not in out
        # pair orientation is canonical (a < b)
        assert all(p[0] < p[1] for p in out)

    def test_counts_are_distinct_shingles(self, spark):
        from mysql_syncer_spark.operators.dedup import (
            char_shingles,
            source_overlap_matrix,
        )
        from pyspark.sql import functions as F

        rows = [("a", 1, "hello hello world"), ("a", 2, "hello world"),
                ("b", 3, "hello world wide")]
        df = spark.createDataFrame(rows, "source string, doc_id long, text string")
        out = source_overlap_matrix(df, "source").collect()[0]
        na = (char_shingles(
            df.where("source='a'").select(F.col("source").alias("__g"), "text"),
            id_col="__g").distinct().count())
        assert out.n_a == na  # per-source distinct shingles, not per-doc
