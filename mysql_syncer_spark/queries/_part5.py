"""Registry chunk 5 — round-11 additions (weighted sampling /
bootstrap inference / corpus reporting).

Chunk started per the registry-hygiene ceiling (test_registry_hygiene.
CHUNK_LINE_CEILING — _part4 sits near it). REGISTRATION ORDER IS THE
CONTRACT: the package __init__ imports chunks in numeric order; appends
go to the LAST chunk. All entries here register PAST the driver window
(positions 50+) and join the ROTATION.md queue per the r11 window
policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

from mysql_syncer_spark.queries._base import _register
from mysql_syncer_spark.sources.catalog import load_table


def _aes_oracle_rank() -> str:
    from mysql_syncer_spark.operators.sampling import (
        duckdb_weighted_reservoir_sql,
    )

    return duckdb_weighted_reservoir_sql("doc_id", "n_chars", k=0)


@_register(
    "weighted_sample_docs",
    f"""WITH r AS (
         SELECT doc_id, n_chars,
                ROUND({_aes_oracle_rank()}, 12) AS rank_key
         FROM documents
         WHERE n_chars IS NOT NULL AND n_chars > 0)
       SELECT doc_id, n_chars, rank_key
       FROM r ORDER BY rank_key DESC, doc_id LIMIT 100""",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E178: weighted sampling without replacement (Efraimidis–Spirakis
    A-ES, the one-scan weighted reservoir): 100 documents drawn with
    probability proportional to length — the standard weighted corpus
    subsample (long docs carry more training tokens). Rank key
    ln(u)/w from the md5-hash 52-bit uniform (r12: finer grain — the
    10k-bucket u biased cutoff ties at scale, ADVICE r11), so the draw
    is deterministic and the oracle reproduces it; ranking runs on the
    ROUNDED key (12 dp, doc_id tie-break) so a 1-ulp ln() difference
    between engines can never flip the cutoff. Top-k is TakeOrderedAndProject — per-
    partition size-k heaps, no global sort shuffle; 100 TB cost is one
    scan (operators/sampling.weighted_reservoir_sample)."""
    from mysql_syncer_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_reservoir_sample(
        docs, "doc_id", "n_chars", k=100
    ).select("doc_id", "n_chars", "rank_key")


def _bootstrap_oracle() -> str:
    from mysql_syncer_spark.operators.stats import duckdb_pois1_weight_sql

    h3 = (
        "substr(md5(CAST(event_id AS VARCHAR) || ':' || "
        "CAST(b // 10 AS VARCHAR)), (b % 10) * 3 + 1, 3)"
    )
    w = duckdb_pois1_weight_sql(h3)
    return f"""WITH base AS (
         SELECT event_type, CAST(value AS DOUBLE) AS v,
                CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0)
                     AS BIGINT) AS v6,
                event_id
         FROM events WHERE value IS NOT NULL),
       rep AS (
         SELECT event_type, v6, event_id, b, {w} AS w
         FROM base CROSS JOIN (
           SELECT unnest(generate_series(0, 31)) AS b)),
       cells AS (
         SELECT event_type, b,
                CASE WHEN SUM(w) > 0 THEN
                  ROUND(CAST(SUM(w * v6) AS DOUBLE) / 1000000.0
                        / CAST(SUM(w) AS DOUBLE), 6)
                END AS bm
         FROM rep GROUP BY 1, 2),
       ranked AS (
         SELECT event_type, b, bm,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY bm NULLS FIRST, b) AS r
         FROM cells),
       ci AS (
         SELECT event_type,
                MAX(CASE WHEN r = 2 THEN bm END) AS ci_lo,
                MAX(CASE WHEN r = 31 THEN bm END) AS ci_hi
         FROM ranked GROUP BY 1),
       pt AS (
         SELECT event_type,
                ROUND(CAST(SUM(v6) AS DOUBLE) / 1000000.0
                      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_v,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM base GROUP BY 1)
       SELECT pt.event_type, mean_v, ci_lo, ci_hi, n
       FROM pt JOIN ci USING (event_type)
       ORDER BY event_type"""


@_register("bootstrap_mean_ci_events", _bootstrap_oracle())
def bootstrap_mean_ci_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E179: Poisson-bootstrap percentile CI for the per-type mean
    event value (32 replicates, ranks 2/31 ≈ a 94% interval) — THE
    distributed bootstrap (Binomial(n,1/n) → Poisson(1), so each row
    draws an independent replicate weight row-locally; Chamandy et al.
    2012). Deterministic and codegen-lean (this was the 2nd-most
    expensive bench key naive): batched md5 draws (one digest per
    (event_id, replicate//10) yields ten 12-bit draws), the inverse
    CDF as fixed-width hex STRING comparisons (no conv per draw), and
    exact fixed-point LONG sums (micro-unit values — order-independent
    where double sums drift, on Spark's fast long path where wide
    DECIMAL is not) so the oracle agrees bit-for-bit. One explode(32) scan
    + one combinable groupBy; shuffle volume is |types| x 32 rows
    regardless of data size (operators/stats.poisson_bootstrap_ci)."""
    from mysql_syncer_spark.operators.stats import poisson_bootstrap_ci

    ev = load_table(spark, sf_dir, "events")
    return poisson_bootstrap_ci(
        ev, ["event_type"], "value", "event_id", n_boot=32
    ).orderBy("event_type")


@_register(
    "corpus_card_docs",
    r"""WITH per AS (
         SELECT source, lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                COUNT(DISTINCT md5(text)) AS dn,
                CAST(SUM(length(text)) AS BIGINT) AS n_chars_total,
                CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END) AS BIGINT) AS n_ws_tokens,
                ROUND(AVG(length(text)), 6) AS mean_chars
         FROM documents GROUP BY 1, 2)
       SELECT source, lang, n_docs,
              ROUND(1.0 - dn / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
              n_chars_total,
              ROUND(n_chars_total / CAST((SELECT SUM(n_chars_total)
                                          FROM per) AS DOUBLE), 6)
                  AS char_share,
              mean_chars, n_ws_tokens
       FROM per ORDER BY source, lang""",
)
def corpus_card_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E180: per-(source, lang) corpus card — the datasheet rollup a
    corpus release ships (doc counts, exact-hash duplicate rate, char
    volume and global share, mean length, whitespace-token volume) in
    ONE combinable groupBy over |slices| keys plus a broadcast 1-row
    total for the share column (operators/text.corpus_card). Every
    aggregate is integer-exact or an exact-int-sum mean, so the oracle
    agrees without float-discipline carve-outs."""
    from mysql_syncer_spark.operators.text import corpus_card

    docs = load_table(spark, sf_dir, "documents")
    return corpus_card(docs, ["source", "lang"]).orderBy(
        "source", "lang"
    )


@_register(
    "weighted_sample_by_lang_docs",
    f"""WITH r AS (
         SELECT doc_id, lang, n_chars,
                ROUND({_aes_oracle_rank()}, 12) AS rank_key
         FROM documents
         WHERE n_chars IS NOT NULL AND n_chars > 0)
       SELECT doc_id, lang, n_chars, rank_key FROM r
       QUALIFY ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY rank_key DESC, doc_id) <= 20
       ORDER BY lang, rank_key DESC, doc_id""",
)
def weighted_sample_by_lang_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E181: per-language weighted sample (20 docs per lang, drawn
    proportional to length within the stratum) — the stratified A-ES
    form quota-based corpus mixes need. Group-partitioned rank window:
    one shuffle on lang, k-bounded reducers per group, no global
    funnel (operators/sampling.weighted_reservoir_sample_grouped)."""
    from mysql_syncer_spark.operators.sampling import (
        weighted_reservoir_sample_grouped,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_reservoir_sample_grouped(
        docs, ["lang"], "doc_id", "n_chars", k=20
    )
    return out.select("doc_id", "lang", "n_chars", "rank_key").orderBy(
        "lang", F.desc("rank_key"), "doc_id"
    )


@_register(
    "source_overlap_docs",
    r"""WITH sh AS (
         SELECT DISTINCT source AS g, shingle FROM (
           SELECT source,
                  unnest(list_transform(
                    range(1, greatest(len(regexp_replace(trim(lower(text)),
                          '\s+', ' ', 'g')) - 4, 1) + 1),
                    i -> substr(regexp_replace(trim(lower(text)),
                          '\s+', ' ', 'g'), i, 5))) AS shingle
           FROM documents) WHERE len(shingle) > 0),
       n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
       inter AS (
         SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS c
         FROM sh a JOIN sh b USING (shingle)
         WHERE a.g < b.g GROUP BY 1, 2)
       SELECT ga AS source_a, gb AS source_b,
              na.n AS n_a, nb.n AS n_b, c AS n_common,
              ROUND(c / CAST(na.n + nb.n - c AS DOUBLE), 6) AS jaccard,
              ROUND(c / CAST(LEAST(na.n, nb.n) AS DOUBLE), 6)
                  AS containment
       FROM inter JOIN n na ON na.g = ga JOIN n nb ON nb.g = gb
       ORDER BY source_a, source_b""",
)
def source_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E182: cross-source duplication audit — exact shingle-set
    overlap (Jaccard + containment) for every pair of sources: the
    slice-level mirror/re-crawl detector (containment ~1 = one source
    inside another). Distinct (source, shingle) grain BEFORE the join:
    quadratic in SOURCES (a low-cardinality dimension), linear in data
    (operators/dedup.source_overlap_matrix)."""
    from mysql_syncer_spark.operators.dedup import source_overlap_matrix

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(docs, "source").orderBy(
        "source_a", "source_b"
    )


@_register(
    "corpus_card_incremental_docs",
    r"""WITH per AS (
         SELECT source, lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                COUNT(DISTINCT md5(text)) AS dn,
                CAST(SUM(length(text)) AS BIGINT) AS n_chars_total,
                CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END) AS BIGINT) AS n_ws_tokens
         FROM documents GROUP BY 1, 2)
       SELECT source, lang, n_docs,
              ROUND(1.0 - dn / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
              n_chars_total,
              ROUND(n_chars_total / CAST((SELECT SUM(n_chars_total)
                                          FROM per) AS DOUBLE), 6)
                  AS char_share,
              ROUND(n_chars_total / CAST(n_docs AS DOUBLE), 6)
                  AS mean_chars,
              n_ws_tokens
       FROM per ORDER BY source, lang""",
)
def corpus_card_incremental_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E183: INCREMENTALLY-maintained corpus card — the corpus split
    into three deterministic hash-batches and folded through the
    O(batch) state updates (additive per-slice sums + a persisted
    distinct-hash table that makes the duplicate count exactly
    incrementable via a batch-sized anti-join), then rendered. The
    oracle recomputes the card from scratch over the whole table: the
    query IS the refresh-equivalence law fold(batches) ≡ recompute,
    machine-checked at every sweep SF
    (operators/text.corpus_card_state / corpus_card_apply_batch /
    corpus_card_from_state; the minhash-corpus-index economics applied
    to release reporting)."""
    from mysql_syncer_spark.operators.sampling import hash_bucket
    from mysql_syncer_spark.operators.text import (
        corpus_card_apply_batch,
        corpus_card_from_state,
        corpus_card_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", salt="card")
    first = docs.where(b < 4000)
    aggs, hashes = corpus_card_state(first, ["source", "lang"])
    for lo, hi in ((4000, 8000), (8000, 10000)):
        batch = docs.where((b >= lo) & (b < hi))
        aggs, hashes = corpus_card_apply_batch(
            aggs, hashes, batch, ["source", "lang"]
        )
        # cut lineage between folds as a real ingest loop would
        aggs = aggs.transform(pin, eager=False)
        hashes = hashes.transform(pin, eager=False)
    return corpus_card_from_state(aggs, ["source", "lang"]).orderBy(
        "source", "lang"
    )


def _stratified_consistency_oracle() -> str:
    from mysql_syncer_spark.operators.sampling import (
        duckdb_weighted_reservoir_sql,
    )

    rk = duckdb_weighted_reservoir_sql("doc_id", "n_chars", k=0)
    return f"""WITH r AS (
         SELECT doc_id, lang, ROUND({rk}, 12) AS rank_key
         FROM documents
         WHERE n_chars IS NOT NULL AND n_chars > 0),
       g AS (SELECT doc_id, lang FROM r
             ORDER BY rank_key DESC, doc_id LIMIT 100),
       s AS (SELECT doc_id FROM r QUALIFY ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY rank_key DESC, doc_id) <= 20),
       per AS (
         SELECT g.lang, CAST(COUNT(*) AS BIGINT) AS n_global,
                CAST(SUM(CASE WHEN s.doc_id IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         FROM g LEFT JOIN s ON g.doc_id = s.doc_id GROUP BY 1)
       SELECT lang, n_global, n_agree,
              CAST(CASE WHEN n_agree = LEAST(n_global, 20)
                   THEN 1 ELSE 0 END AS INT) AS law_holds
       FROM per ORDER BY lang"""


@_register("stratified_consistency_docs", _stratified_consistency_oracle())
def stratified_consistency_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E184 (r12, VERDICT r11 item 7): the stratified-vs-global A-ES
    consistency law as an oracle-backed key. Because the A-ES rank key
    is ROW-LOCAL (one shared 52-bit md5 uniform per key, same salt),
    the per-stratum draw IS the global draw's ordering restricted to
    the stratum: every member of the global top-100 that belongs to
    lang g must also be inside g's stratified top-20 (whenever g
    contributes <= 20 rows to the global sample — always true here
    since 20 per lang bounds it). The query runs BOTH operators
    (operators/sampling.weighted_reservoir_sample and
    weighted_reservoir_sample_grouped — the real production code
    paths, not a re-derivation), joins them, and emits per-lang
    (n_global, n_agree, law_holds); the oracle recomputes both sides
    in SQL, so the driver certifies (a) the rank keys agree across
    engines AND (b) the law holds (law_holds = 1 on every row).

    Scale shape: two scans (one per draw) — the global side is
    TakeOrderedAndProject (k-sized heaps, no global sort), the
    stratified side one window shuffle on lang; the agreement join is
    a broadcast of the 100-row global sample. Nothing data-sized moves.
    """
    from mysql_syncer_spark.operators.sampling import (
        weighted_reservoir_sample,
        weighted_reservoir_sample_grouped,
    )

    docs = load_table(spark, sf_dir, "documents")
    glob = weighted_reservoir_sample(docs, "doc_id", "n_chars", k=100)
    strat = weighted_reservoir_sample_grouped(
        docs, ["lang"], "doc_id", "n_chars", k=20
    ).select("doc_id", F.lit(1).alias("__in_strat"))
    per = (
        glob.select("doc_id", "lang")
        .join(F.broadcast(strat), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_global"),
            F.coalesce(F.sum("__in_strat"), F.lit(0)).alias("n_agree"),
        )
    )
    return per.select(
        "lang",
        "n_global",
        "n_agree",
        F.when(
            F.col("n_agree") == F.least(F.col("n_global"), F.lit(20)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("law_holds"),
    ).orderBy("lang")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_COHORTS = [0, 1, 2, 3]


def _chi2_oracle() -> str:
    """Mirror of operators/stats.chi2_independence over event_type x
    (user_id mod 4): same fixed cell order, same HUGEINT-squared
    integer numerator (a double square would round before the divide),
    one double division per cell."""
    cells = ",\n            ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' AND "
        f"((user_id % 4) + 4) % 4 = {c} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c_{i}_{j}"
        for i, t in enumerate(_EVENT_TYPES)
        for j, c in enumerate(_COHORTS)
    )
    nr, nc = len(_EVENT_TYPES), len(_COHORTS)
    rows = ",\n            ".join(
        f"({' + '.join(f'c_{i}_{j}' for j in range(nc))}) AS r_{i}"
        for i in range(nr)
    )
    cols = ",\n            ".join(
        f"({' + '.join(f'c_{i}_{j}' for i in range(nr))}) AS k_{j}"
        for j in range(nc)
    )
    n = " + ".join(f"r_{i}" for i in range(nr))
    terms = "\n          + ".join(
        f"CASE WHEN r_{i} > 0 AND k_{j} > 0 THEN "
        f"CAST(CAST(n * c_{i}_{j} - r_{i} * k_{j} AS HUGEINT) * "
        f"CAST(n * c_{i}_{j} - r_{i} * k_{j} AS HUGEINT) AS DOUBLE) "
        f"/ CAST(n * r_{i} * k_{j} AS DOUBLE) ELSE 0.0 END"
        for i in range(nr)
        for j in range(nc)
    )
    dof = (nr - 1) * (nc - 1)
    vmin = min(nr, nc) - 1
    return f"""WITH c AS (
         SELECT {cells}
         FROM events),
       m AS (
         SELECT *, {rows},
            {cols}
         FROM c),
       m2 AS (SELECT *, ({n}) AS n FROM m),
       f AS (SELECT n, ({terms}) AS chi2 FROM m2)
       SELECT n AS n_rows, ROUND(chi2, 6) AS chi2,
              CAST({dof} AS INT) AS dof,
              ROUND(sqrt(chi2 / (CAST(n AS DOUBLE) * {vmin}.0)), 6)
                  AS cramers_v
       FROM f"""


@_register("chi2_independence_events", _chi2_oracle())
def chi2_independence_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E186: χ² independence audit of event mix vs the deterministic
    4-way traffic cohort (user_id mod 4) — one combinable aggregate
    over fixed category lists (operators/stats.chi2_independence);
    integer numerators squared in DECIMAL so both engines round
    identically."""
    from mysql_syncer_spark.operators.stats import chi2_independence

    events = load_table(spark, sf_dir, "events")
    return chi2_independence(
        events,
        "event_type",
        F.pmod(F.col("user_id"), F.lit(4)),
        _EVENT_TYPES,
        _COHORTS,
    )


@_register(
    "source_concentration_docs",
    r"""WITH cnt AS (
         SELECT lang, source, COUNT(*) AS c
         FROM documents GROUP BY 1, 2),
       rk AS (
         SELECT lang, source, c,
                ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY c, source) AS rk
         FROM cnt),
       g AS (
         SELECT lang, CAST(SUM(c) AS BIGINT) AS tot,
                CAST(COUNT(*) AS BIGINT) AS n_items,
                CAST(SUM(rk * c) AS BIGINT) AS rksum,
                CAST(SUM(c * c) AS BIGINT) AS sq,
                CAST(MAX(c) AS BIGINT) AS top
         FROM rk GROUP BY 1)
       SELECT lang, tot AS n_rows, n_items,
              ROUND(CAST(2 * rksum - (n_items + 1) * tot AS DOUBLE)
                    / CAST(n_items * tot AS DOUBLE), 6) AS gini,
              ROUND(CAST(sq AS DOUBLE) / CAST(tot * tot AS DOUBLE), 6)
                  AS hhi,
              ROUND(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                  AS top_share
       FROM g ORDER BY lang""",
)
def source_concentration_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E187: per-language source-concentration audit (Gini over the
    sorted-rank closed form, HHI, top-source share) — how dominated
    each language's corpus is by a few crawls
    (operators/stats.concentration_profile). Integer numerators,
    one rounded division each."""
    from mysql_syncer_spark.operators.stats import concentration_profile

    docs = load_table(spark, sf_dir, "documents")
    return concentration_profile(docs, ["lang"], "source").orderBy(
        "lang"
    )


_KAPPA_CATS = ["de", "en", "es", "fr", "und", "zh"]


def _kappa_oracle() -> str:
    """Mirror of operators/stats.cohens_kappa over (lang,
    lang_pred): the lang_id_docs stopword-heuristic CTEs verbatim,
    then the integer κ form (n·agree − Σ r_k·p_k) / (n² − Σ r_k·p_k)
    — exact BIGINT sums, one double division."""
    cats = _KAPPA_CATS
    sums = ",\n            ".join(
        f"CAST(SUM(CASE WHEN t = '{c}' AND pr IN "
        f"({', '.join(repr(x) for x in cats)}) THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS r_{i},\n            "
        f"CAST(SUM(CASE WHEN pr = '{c}' AND t IN "
        f"({', '.join(repr(x) for x in cats)}) THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS p_{i}"
        for i, c in enumerate(cats)
    )
    inlist = ", ".join(repr(x) for x in cats)
    rc = " + ".join(f"r_{i} * p_{i}" for i in range(len(cats)))
    return rf"""WITH toks AS (
          SELECT doc_id, text, lang,
                 CASE WHEN trim(lower(text)) = '' THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+')
                 END AS ts
          FROM documents),
        scores AS (
          SELECT doc_id, text, lang,
            len(list_filter(ts, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
            len(list_filter(ts, t -> t IN ('the','a','of','and','is','to','in'))) AS s_en,
            len(list_filter(ts, t -> t IN ('el','la','los','es','y','un','una'))) AS s_es,
            len(list_filter(ts, t -> t IN ('le','la','les','est','et','un','une'))) AS s_fr
          FROM toks),
        j AS (
          SELECT lang AS t,
              CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                   WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                   WHEN s_fr > 0 THEN 'fr'
                   ELSE 'und' END AS pr
          FROM scores),
        s AS (
          SELECT
            CAST(SUM(CASE WHEN t IN ({inlist}) AND pr IN ({inlist})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN t IN ({inlist}) AND pr IN ({inlist})
                 AND t = pr THEN 1 ELSE 0 END) AS BIGINT) AS agree,
            CAST(SUM(CASE WHEN t IS NULL OR pr IS NULL
                 OR t NOT IN ({inlist}) OR pr NOT IN ({inlist})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
            {sums}
          FROM j)
       SELECT n AS n_rows, n_excluded,
              ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS agreement,
              ROUND(CAST({rc} AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
                  AS expected_agreement,
              ROUND(CAST(n * agree - ({rc}) AS DOUBLE)
                    / CAST(n * n - ({rc}) AS DOUBLE), 6) AS kappa
       FROM s"""


@_register("langid_kappa_docs", _kappa_oracle())
def langid_kappa_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E188: Cohen's κ between the labeled ``lang`` column and the
    stopword-heuristic prediction (operators/text.with_lang_id fed
    into operators/stats.cohens_kappa) — the classifier-quality audit
    that corrects raw agreement for the chance agreement the skewed
    label mix produces. Integer numerator/denominator, one rounded
    division; one scan, no join."""
    from mysql_syncer_spark.operators.spread import spread_small
    from mysql_syncer_spark.operators.stats import cohens_kappa
    from mysql_syncer_spark.operators.text import with_lang_id

    # the stopword-scoring map work sits above one tiny aggregate —
    # spread a small scan (per-row pure prediction, integer counts)
    docs = spread_small(load_table(spark, sf_dir, "documents"))
    return cohens_kappa(
        with_lang_id(docs), "lang", "lang_pred", _KAPPA_CATS
    )


@_register(
    "ngram_diversity_docs",
    r"""WITH toks AS (
         SELECT source,
                CASE WHEN trim(text) = '' THEN []
                     ELSE regexp_split_to_array(trim(text), '\s+')
                END AS ts
         FROM documents),
       uni AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(COUNT(DISTINCT g) AS BIGINT) AS n_types
         FROM (SELECT source, unnest(ts) AS g FROM toks)
         GROUP BY 1),
       bg AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                CAST(COUNT(DISTINCT g) AS BIGINT) AS n_bigram_types
         FROM (SELECT source,
                      unnest(list_transform(range(1, len(ts)),
                             i -> ts[i] || ' ' || ts[i + 1])) AS g
               FROM toks)
         GROUP BY 1)
       SELECT uni.source, n_tokens, n_types,
              ROUND(CAST(n_types AS DOUBLE)
                    / CAST(n_tokens AS DOUBLE), 6) AS ttr,
              COALESCE(n_bigrams, 0) AS n_bigrams,
              COALESCE(n_bigram_types, 0) AS n_bigram_types,
              CASE WHEN COALESCE(n_bigrams, 0) > 0 THEN
                   ROUND(CAST(n_bigram_types AS DOUBLE)
                         / CAST(n_bigrams AS DOUBLE), 6)
              END AS bigram_ttr
       FROM uni LEFT JOIN bg ON uni.source = bg.source
       ORDER BY uni.source""",
)
def ngram_diversity_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E189: per-source lexical-diversity audit — unigram and bigram
    type-token ratios (operators/text.ngram_diversity): the cheap
    template/boilerplate detector (bigram TTR collapses on stamped
    phrasing while unigram TTR holds). countDistinct rewrites to
    two-level partial aggregates — gram fan-out combines map-side."""
    from mysql_syncer_spark.operators.text import ngram_diversity

    docs = load_table(spark, sf_dir, "documents")
    return ngram_diversity(docs, ["source"]).orderBy("source")


def _jsd_oracle() -> str:
    """Mirror of operators/drift.js_divergence over weekday-vs-weekend
    event_type mixes: fixed category order, 0·ln 0 = 0 cells, one
    division per probability."""
    cats = _EVENT_TYPES
    wd = "EXTRACT(dow FROM ts) NOT IN (0, 6)"
    we = "EXTRACT(dow FROM ts) IN (0, 6)"
    sums = ",\n            ".join(
        f"CAST(SUM(CASE WHEN {wd} AND event_type = '{c}' THEN 1 ELSE 0 "
        f"END) AS BIGINT) AS a{i},\n            "
        f"CAST(SUM(CASE WHEN {we} AND event_type = '{c}' THEN 1 ELSE 0 "
        f"END) AS BIGINT) AS b{i}"
        for i, c in enumerate(cats)
    )
    na = " + ".join(f"a{i}" for i in range(len(cats)))
    nb = " + ".join(f"b{i}" for i in range(len(cats)))
    terms = []
    for i in range(len(cats)):
        pa = f"(CAST(a{i} AS DOUBLE) / CAST(na AS DOUBLE))"
        pb = f"(CAST(b{i} AS DOUBLE) / CAST(nb AS DOUBLE))"
        m = f"(({pa} + {pb}) / 2.0)"
        terms.append(
            f"(CASE WHEN a{i} > 0 THEN 0.5 * {pa} * ln({pa} / {m}) "
            f"ELSE 0.0 END + CASE WHEN b{i} > 0 THEN 0.5 * {pb} * "
            f"ln({pb} / {m}) ELSE 0.0 END)"
        )
    jsd = "\n          + ".join(terms)
    return f"""WITH s AS (
         SELECT {sums}
         FROM events),
       t AS (SELECT *, ({na}) AS na, ({nb}) AS nb FROM s),
       f AS (SELECT na, nb, ({jsd}) AS jsd FROM t)
       SELECT na AS n_a, nb AS n_b, ROUND(jsd, 6) AS jsd,
              ROUND(jsd / ln(2.0), 6) AS jsd_norm
       FROM f"""


@_register("js_weekend_drift_events", _jsd_oracle())
def js_weekend_drift_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E190: Jensen-Shannon divergence between the weekday and weekend
    event-type mixes (operators/drift.js_divergence) — the bounded,
    symmetric categorical-drift reading (PSI is for binned numerics;
    KS for continuous values). Two combinable 1-row folds + a
    broadcast cross-join."""
    from mysql_syncer_spark.operators.drift import js_divergence

    ev = load_table(spark, sf_dir, "events")
    weekend = F.dayofweek("ts").isin(1, 7)
    return js_divergence(
        ev.where(~weekend), ev.where(weekend), "event_type",
        _EVENT_TYPES,
    )


def _transition_entropy_oracle() -> str:
    """Mirror of operators/sequence.transition_entropy: the
    event_transitions lag CTE + fixed-order conditional entropy."""
    cats = _EVENT_TYPES
    sums = ",\n            ".join(
        f"CAST(SUM(CASE WHEN next_type = '{c}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS c{i}"
        for i, c in enumerate(cats)
    )
    n = " + ".join(f"c{i}" for i in range(len(cats)))
    terms = []
    for i in range(len(cats)):
        p = f"(CAST(c{i} AS DOUBLE) / CAST(n AS DOUBLE))"
        terms.append(
            f"CASE WHEN c{i} > 0 THEN -({p} * ln({p})) ELSE 0.0 END"
        )
    ent = "\n          + ".join(terms)
    return f"""WITH p AS (
          SELECT LAG(event_type) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_type,
                 event_type AS next_type
          FROM events),
       g AS (
         SELECT prev_type, {sums}
         FROM p WHERE prev_type IS NOT NULL GROUP BY 1),
       t AS (SELECT *, ({n}) AS n FROM g),
       e AS (SELECT prev_type, n, ({ent}) AS ent FROM t WHERE n > 0)
       SELECT prev_type, n AS n_transitions,
              ROUND(ent, 6) AS entropy,
              ROUND(ent / ln({len(cats)}.0), 6) AS norm_entropy,
              ROUND(exp(ent), 6) AS perplexity
       FROM e ORDER BY prev_type"""


@_register("transition_entropy_events", _transition_entropy_oracle())
def transition_entropy_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E191: next-event predictability — conditional entropy /
    perplexity of each state's transition row
    (operators/sequence.transition_entropy): the funnel-vs-noise
    summary of the E105 Markov matrix. One lag window (the
    sessionization exchange) + one combinable groupBy."""
    from mysql_syncer_spark.operators.sequence import transition_entropy

    ev = load_table(spark, sf_dir, "events")
    return transition_entropy(
        ev, "user_id", "ts", "event_type", "event_id", _EVENT_TYPES
    ).orderBy("prev_type")


@_register(
    "zipf_fit_docs",
    r"""WITH toks AS (
         SELECT lang,
                unnest(CASE WHEN trim(lower(text)) = '' THEN []
                       ELSE regexp_split_to_array(trim(lower(text)),
                                                  '\s+')
                       END) AS tok
         FROM documents),
       cnt AS (SELECT lang, tok, COUNT(*) AS c
               FROM toks GROUP BY 1, 2),
       rk AS (SELECT lang, c,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY c DESC, tok) AS rk
              FROM cnt),
       top AS (SELECT lang, ln(CAST(rk AS DOUBLE)) AS x,
                      ln(CAST(c AS DOUBLE)) AS y
               FROM rk WHERE rk <= 100)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_top,
              ROUND(-regr_slope(y, x), 6) AS zipf_alpha,
              ROUND(regr_intercept(y, x), 6) AS intercept,
              ROUND(regr_r2(y, x), 6) AS r2
       FROM top GROUP BY lang ORDER BY lang""",
)
def zipf_fit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E192: per-language Zipf-law fit over the top-100 token
    frequencies (operators/text.zipf_fit) — ln-ln OLS through the
    closed-form regr aggregates; head-shape complement to the E189
    tail-width TTRs. Ranks are exact-integer (count DESC, token)."""
    from mysql_syncer_spark.operators.text import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, ["lang"], top_k=100).orderBy("lang")


@_register(
    "stratified_kfold_docs",
    r"""WITH a AS (
         SELECT lang,
                (ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR) || 'kfold'),
                              doc_id) - 1) % 5 AS fold
         FROM documents),
       g AS (SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM a GROUP BY 1, 2),
       s AS (SELECT lang, fold, n_docs,
                    MAX(n_docs) OVER (PARTITION BY lang)
                    - MIN(n_docs) OVER (PARTITION BY lang) AS spread
             FROM g)
       SELECT lang, CAST(fold AS INT) AS fold, n_docs,
              CAST(spread AS BIGINT) AS spread,
              CAST(CASE WHEN spread <= 1 THEN 1 ELSE 0 END AS INT)
                  AS balanced
       FROM s ORDER BY lang, fold""",
)
def stratified_kfold_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E193: stratified 5-fold assignment with the per-stratum balance
    law SURFACED (operators/sampling.stratified_kfold): per (lang,
    fold) sizes plus the within-lang max−min spread — ≤ 1 by
    construction (round-robin deal over a deterministic md5 shuffle),
    not in expectation like a plain hash split; `balanced` must read
    1 on every row. One rank window per stratum, no joins."""
    from pyspark.sql import Window

    from mysql_syncer_spark.operators.sampling import stratified_kfold

    docs = load_table(spark, sf_dir, "documents")
    g = (
        stratified_kfold(docs, ["lang"], "doc_id", k=5, salt="kfold")
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    wl = Window.partitionBy("lang")
    return (
        g.withColumn(
            "spread",
            (F.max("n_docs").over(wl) - F.min("n_docs").over(wl)).cast(
                "long"
            ),
        )
        .select(
            "lang",
            F.col("fold").cast("int").alias("fold"),
            "n_docs",
            "spread",
            F.when(F.col("spread") <= 1, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("balanced"),
        )
        .orderBy("lang", "fold")
    )


@_register(
    "km_retention_events",
    r"""WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
       seq AS (
         SELECT user_id, ts,
                LEAD(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt
         FROM events),
       obs AS (
         SELECT CAST((CASE WHEN nxt IS NULL
                      THEN date_diff('microsecond', ts,
                                     (SELECT tmax FROM mx))
                      ELSE date_diff('microsecond', ts, nxt) END)
                     // 1000000 AS BIGINT) AS dur,
                CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS evt
         FROM seq),
       g AS (SELECT dur, CAST(SUM(evt) AS BIGINT) AS d,
                    CAST(COUNT(*) AS BIGINT) AS m
             FROM obs GROUP BY 1),
       tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM g),
       r AS (SELECT dur, d,
                    CAST((SELECT n FROM tot)
                         - COALESCE(SUM(m) OVER (ORDER BY dur
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS risk
             FROM g),
       s AS (SELECT dur, d, risk,
                    CASE WHEN MAX(CASE WHEN d > 0 AND d >= risk
                                  THEN 1 ELSE 0 END)
                              OVER (ORDER BY dur) = 1 THEN 0.0
                    ELSE exp(SUM(CASE WHEN d > 0 AND d < risk THEN
                             ln(1 - CAST(d AS DOUBLE)
                                    / CAST(risk AS DOUBLE))
                             ELSE 0.0 END)
                         OVER (ORDER BY dur)) END AS surv
             FROM r),
       e AS (SELECT * FROM s WHERE d > 0),
       probes(probe) AS (VALUES (60), (300), (900), (3600),
                                (14400), (86400)),
       best AS (SELECT probe, MAX(e.dur) AS dur
                FROM probes LEFT JOIN e ON e.dur <= probes.probe
                GROUP BY 1)
       SELECT CAST(best.probe AS BIGINT) AS probe,
              e.risk AS n_risk, e.d AS d_events,
              ROUND(e.surv, 6) AS survival
       FROM best LEFT JOIN e ON best.dur = e.dur
       ORDER BY probe""",
)
def km_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E194: Kaplan-Meier survival of inter-event gaps with
    right-censoring at the observation-window close — "what fraction
    of users go longer than T without another event?" done correctly
    (a user's LAST gap is censored: it leaves the at-risk set without
    counting as an event; a naive gap histogram undercounts long
    waits). Durations quantized to exact integer seconds
    (epoch-micros integer division); survival evaluated at a fixed
    probe grid (operators/stats.kaplan_meier)."""
    from pyspark.sql import Window

    from mysql_syncer_spark.operators.stats import kaplan_meier

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tmax = ev.agg(F.max("ts").alias("__tmax"))
    seq = ev.select(
        "ts", F.lead("ts").over(w).alias("__nxt")
    ).crossJoin(F.broadcast(tmax))
    obs = seq.select(
        # timestampdiff works on TIMESTAMP_NTZ (unix_micros does not);
        # at MICROSECOND grain it equals the exact epoch-micros diff
        F.expr(
            "(CASE WHEN __nxt IS NOT NULL "
            "THEN timestampdiff(MICROSECOND, ts, __nxt) "
            "ELSE timestampdiff(MICROSECOND, ts, __tmax) END) "
            "div 1000000"
        ).alias("dur"),
        F.when(F.col("__nxt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("evt"),
    )
    return kaplan_meier(
        obs, "dur", "evt", [60, 300, 900, 3600, 14400, 86400]
    )
