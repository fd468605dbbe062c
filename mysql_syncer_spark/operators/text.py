"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Spark SQL functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Every operator has an exact
ANSI-SQL mirror so the DuckDB oracle can verify it (md5-based hashing is
used where a hash is needed, because both engines implement md5
identically; the scale path could swap xxhash64 at the cost of oracle
parity).

Operators:
* token counting  — whitespace tokens + a BPE-ish regex token count
* quality scoring — length / punctuation / stopword / digit ratios
* language ID     — stopword-hit heuristic over a small marker table
* fingerprinting  — content fingerprint (exact) + bag fingerprint
  (order-insensitive, catches token-permuted near-copies)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

#: BPE-ish word/number/punctuation tokenizer (applied identically in the
#: DuckDB oracle via regexp_extract_all).
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword marker lists for the langid heuristic.
#: Deliberately small and deterministic — this is an n-gram/stopword
#: heuristic, not a model; ties broken by language code order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "es", "y", "un", "una"),
    "fr": ("le", "la", "les", "est", "et", "un", "une"),
}

STOPWORDS = LANG_MARKERS["en"]


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization: split on runs of whitespace, after trim.
    Empty string → empty array (split of '' yields [''])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def with_token_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Add ``n_tokens_ws`` (whitespace) and ``n_tokens_bpe`` (regex)."""
    return df.withColumn(
        "n_tokens_ws", F.size(ws_tokens(text_col))
    ).withColumn(
        "n_tokens_bpe",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0)),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add quality signals + a composite ``quality_score`` in [0,1].

    Signals (all ratios of codegen'd length arithmetic):
    * ``punct_ratio``    — non-alnum-non-space chars / chars
    * ``digit_ratio``    — digit chars / chars
    * ``stopword_ratio`` — stopword tokens / tokens
    * ``mean_word_len``  — chars / tokens
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = ws_tokens(text_col)
    n_toks = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    )
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(n_toks, F.lit(1))
    punct_ratio = punct.cast("double") / safe_chars
    digit_ratio = digits.cast("double") / safe_chars
    stop_ratio = stop.cast("double") / safe_toks
    mean_word_len = n_chars.cast("double") / safe_toks
    # heuristic score: long-enough docs with some stopwords and little
    # punctuation/digit noise score high
    score = (
        F.least(n_toks.cast("double") / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(4.0), F.lit(1.0))) * 0.1
    )
    # least()/greatest() skip NULLs, which would quietly score NULL text
    # as 0.7 — pin NULL input to 0
    score = F.when(c.isNull(), F.lit(0.0)).otherwise(score)
    return (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``lang_pred``: argmax of per-language stopword hit counts.

    Deterministic: ties resolved by ascending language code ('de' < 'en'
    < 'es' < 'fr'); zero hits everywhere → 'und' (undetermined). CJK
    codepoints short-circuit to 'zh'.
    """
    toks = ws_tokens(F.lower(F.col(text_col)))

    def marker_hits(markers):
        # closure factory: a default-arg lambda would look 2-ary to
        # F.filter, which then binds the element index to it
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        (lang, marker_hits(markers))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # build argmax with deterministic tie-break: best = first lang (in
    # sorted order) whose score equals the max and is > 0
    max_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when((s == max_score) & (s > 0), F.lit(lang)).otherwise(pred)
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    return df.withColumn(
        "lang_pred", F.when(has_cjk, F.lit("zh")).otherwise(pred)
    )


def with_repetition(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Add ``rep_ratio``: the duplicated word-n-gram fraction of the doc,
    ``1 - distinct_ngrams / total_ngrams`` (Gopher-style repetition
    signal — templated/boilerplate text scores high, prose near 0).

    Pure codegen array ops on one row at a time — embarrassingly
    parallel, no shuffle. Docs with < n tokens have no n-grams and score
    0. DuckDB mirror: ``1 - len(list_distinct(g))/len(g)`` over
    ``list_transform(range(1, greatest(len(tk)-n+2, 1)),
    i -> array_to_string(tk[i:i+n-1], ' '))``.
    """
    toks = F.split(normalized_text(text_col), " ")
    grams = F.expr(
        f"if(size(__rep_tk) >= {n}, "
        f"transform(sequence(1, size(__rep_tk) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__rep_tk, i, {n}))), "
        f"cast(array() as array<string>))"
    )
    return (
        df.withColumn("__rep_tk", toks)
        .withColumn("__rep_g", grams)
        .withColumn(
            "rep_ratio",
            F.when(F.size("__rep_g") == 0, F.lit(0.0)).otherwise(
                F.lit(1.0)
                - F.size(F.array_distinct("__rep_g"))
                / F.size("__rep_g").cast("double")
            ),
        )
        .drop("__rep_tk", "__rep_g")
    )


#: PII patterns, ordered (emails first — an email's digits must not be
#: half-eaten by the phone pattern). Restricted to syntax valid AND
#: equivalent in BOTH Java regex (Spark) and RE2 (DuckDB): character
#: classes, bounded repetition, \b word boundaries; no lookarounds.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() -]{6,}[0-9]\b", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails / IPv4s / phone-number-shaped spans with typed
    placeholder tokens — chained codegen ``regexp_replace``, no UDF.
    Heuristic by design (training-data scrubbing, not compliance
    tooling): patterns are deliberately simple enough to behave
    identically under Java regex and RE2."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``redacted`` (PII-scrubbed text) and ``n_pii`` (total spans
    redacted, counted pattern-by-pattern on the progressively redacted
    text so overlapping patterns aren't double-counted)."""
    c: Column = F.col(text_col)
    n = F.lit(0)
    for _, pat, token in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        c = F.regexp_replace(c, pat, token)
    return df.withColumn("redacted", c).withColumn(
        "n_pii", n.cast("int")
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``(id, term, tfidf)``.

    The classic keyword/topic signal for corpus triage. Plan shape (all
    built-ins, scale-safe):

    * term frequencies — one combinable shuffle on ``(id, term)``;
    * document frequencies — one combinable shuffle on ``term`` over the
      already-deduplicated tf frame (never the raw token stream);
    * idf joined back **broadcast** (a vocabulary is small relative to
      the corpus — ~millions of terms vs billions of docs);
    * per-doc top-k — one window shuffle on ``id``, running-rank state
      only (a giant doc costs one fat task, not driver memory).

    Smoothed idf ``ln((N+1)/(df+1)) + 1`` (sklearn's convention) so
    corpus-universal terms still get a positive score. The rank orders
    by the ROUNDED score (6 dp) with the term as tie-break, making the
    top-k reproducible bit-for-bit across engines — the DuckDB oracle
    mirrors every step including the rounding.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    # (r12 negative result: spread_small on the projected scan measured
    # 0.93 -> 1.53 s isolated — text-payload shuffle + keyless-
    # repartition sort; the (id, term) shuffle dominates. Reverted.)
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a broadcast 1-row frame, not a driver-side
    # df.count(): keeps the whole operator ONE Spark job and never
    # re-scans a non-columnar source just to learn N (parquet made the
    # count look free; a JDBC/CSV source would pay a full pass)
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = docfreq.crossJoin(F.broadcast(n_docs)).withColumn(
        "idf",
        F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0),
    ).drop("__n")
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(id_col, "term", "tfidf")
    )


def normalized_text(col: Column | str) -> Column:
    """Lowercase + collapse internal whitespace + trim — the
    canonicalization used by both fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``fp_exact`` (md5 of normalized text) and ``fp_bag`` (md5 of
    the sorted distinct token multiset — order-insensitive, catches
    token-permuted near-copies)."""
    norm = normalized_text(text_col)
    bag = F.array_join(F.array_sort(F.array_distinct(ws_tokens(norm))), " ")
    return df.withColumn("fp_exact", F.md5(norm)).withColumn(
        "fp_bag", F.md5(bag)
    )


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    max_ellipsis_line_ratio: float = 0.3,
    max_bullet_line_ratio: float = 0.9,
) -> DataFrame:
    """Add the Gopher quality-filter rule flags and the composite
    ``gopher_keep`` decision (Rae et al. 2021, "Scaling Language
    Models", table A1 — the de-facto standard pretraining text filter,
    reused by RefinedWeb/Dolma/FineWeb).

    Per-doc boolean flags, every one pure codegen ratio arithmetic
    (shuffle-free, embarrassingly parallel at any scale):

    * ``rule_word_count``    — word count in [min_words, max_words]
    * ``rule_mean_word_len`` — mean word length in [min, max]
    * ``rule_symbol_ratio``  — (# of '#' chars + '...'/'…' runs) /
      words <= max_symbol_ratio
    * ``rule_alpha_words``   — fraction of words containing at least
      one alphabetic char >= min_alpha_word_ratio
    * ``rule_stopwords``     — at least ``min_stopword_hits``
      DISTINCT English stopword markers present (Gopher requires 2
      distinct stop words — repeats of one stopword don't count)
    * ``rule_ellipsis_lines``— fraction of lines ending in an ellipsis
      <= max_ellipsis_line_ratio
    * ``rule_bullet_lines``  — fraction of lines starting with a
      bullet <= max_bullet_line_ratio
    * ``gopher_keep``        — AND of all flags

    NULL text fails every rule (keep = false). Ratios divide by
    max(count, 1) so empty docs are well-defined (and fail on the
    word-count rule anyway).
    """
    c = F.col(text_col)
    toks = ws_tokens(text_col)
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    n_chars_in_words = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_wl = n_chars_in_words.cast("double") / safe_words
    n_symbols = F.size(
        F.regexp_extract_all(c, F.lit(r"#|\.\.\.|…"), 0)
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # DISTINCT stopwords, per the paper's rule ("contain at least two
    # of the following English words") — a doc repeating one stopword
    # ('the the the') must NOT pass; array_intersect dedups
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in STOPWORDS]),
        )
    )
    lines = F.split(c, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]"))
    )

    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": (n_symbols.cast("double") / safe_words)
        <= max_symbol_ratio,
        "rule_alpha_words": (alpha_words.cast("double") / safe_words)
        >= min_alpha_word_ratio,
        "rule_stopwords": stop_hits >= min_stopword_hits,
        "rule_ellipsis_lines": (ellipsis_lines.cast("double") / n_lines)
        <= max_ellipsis_line_ratio,
        "rule_bullet_lines": (bullet_lines.cast("double") / n_lines)
        <= max_bullet_line_ratio,
    }
    out = df
    keep = F.lit(True)
    for name, flag in rules.items():
        flag = F.when(c.isNull(), F.lit(False)).otherwise(flag)
        out = out.withColumn(name, flag)
        keep = keep & flag
    return out.withColumn("gopher_keep", keep)


def with_unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-unigram mean log10 probability — the
    CCNet-style language-model quality signal (Wenzek et al. 2020):
    documents whose tokens are improbable under the corpus' own unigram
    distribution (gibberish, OCR noise, base64 blobs, wrong-language
    fragments) score far below fluent text, and the score buckets
    directly into CCNet's head/middle/tail quality tiers.

    Output: one row per input doc — ``id_col``, ``n_tokens`` (0 for
    empty/NULL docs), ``logprob`` (mean log10 unigram probability,
    rounded to 6 dp; NULL when the doc has no tokens).

    Plan shape (scale-safe, all built-ins):

    * token stream — normalized-text explode (one corpus restatement);
    * unigram counts — one map-side-combinable shuffle on the term
      (vocabulary-sized output: Zipf makes vocab ≪ corpus);
    * total-token count — in-plan 1-row agg crossJoined broadcast (one
      Spark job end-to-end, no driver count());
    * vocab **broadcast** back onto the token stream — the corpus-sized
      stream never shuffles for the probability lookup;
    * per-doc mean — one combinable shuffle on the doc id.

    No smoothing needed: every token of every doc is in the vocabulary
    by construction (its own occurrence counts), so p >= 1/total > 0.
    Rounding to 6 dp absorbs float-summation-order drift, the same
    convention as tfidf_topk/group_centroids.
    """
    # (r12 negative result: spread_small on the projected scan measured
    # 1.22 -> 1.60 s isolated — the round-robin exchange ships the full
    # text payload and pays the keyless-repartition local sort, while
    # this query is bound by its downstream shuffles, not the scan
    # task. Reverted; per-row-pure siblings like langid/pii DID win.)
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    total = vocab.agg(F.sum("__c").alias("__t"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.log10(F.col("__c").cast("double") / F.col("__t")).alias("__lp"),
    )
    per_doc = (
        words.join(F.broadcast(probs), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.avg("__lp"), 6).alias("__avg"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_tokens"),
        F.col("__avg").alias("logprob"),
    )


def with_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-bigram mean log10 conditional probability —
    the order-sensitive sibling of :func:`with_unigram_logprob`
    (CCNet's KenLM stage uses a 5-gram LM; the bigram is the strongest
    n for exact cross-engine SQL parity). A doc of real words in
    scrambled order scores high under the unigram model but LOW here:
    ``p(w_i | w_{i-1}) = c(w_{i-1} w_i) / c_ctx(w_{i-1})`` punishes
    improbable transitions, not just improbable words.

    Output: one row per input doc — ``id_col``, ``n_bigrams`` (0 for
    docs with < 2 tokens), ``logprob`` (mean log10 conditional bigram
    probability, 6 dp; NULL when the doc has no bigrams).

    No smoothing needed: every bigram of every doc is in the corpus
    counts by construction, and every context count >= its bigram
    count, so 0 < p <= 1 always.

    Plan shape: bigram stream = one row-local zip_with restatement;
    bigram counts = one combinable (w1, w2) shuffle (distinct-bigram-
    sized — bigger than the unigram vocab but still ≪ corpus by Zipf);
    context counts derive from the counts table (second tiny shuffle);
    the probability lookup joins the doc's bigram stream against the
    counts on (w1, w2) — AQE broadcasts it when it fits, else a plain
    hash join on the bigram key; per-doc mean = one doc-id shuffle.
    """
    toks = F.filter(
        F.split(normalized_text(text_col), " "), lambda x: x != ""
    )
    # materialize the tokens array once so both slice sides of the
    # zip_with read the same child expression (r12 negative result:
    # spread_small here measured 1.36 -> 1.66 s isolated — the text-
    # payload shuffle + keyless-repartition sort cost more than the
    # single-task explode it parallelizes; the (w1,w2) shuffle and the
    # probability-lookup join dominate this query. Reverted.)
    base = df.withColumn("__toks", toks)
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    stream = (
        base.select(F.col(id_col), F.explode(bigrams).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"),
                F.col("__bg.w2").alias("w2"))
    )
    cnt = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
    ctx = cnt.groupBy("w1").agg(F.sum("__c").alias("__t"))
    probs = cnt.join(F.broadcast(ctx), "w1").select(
        "w1", "w2",
        F.log10(F.col("__c").cast("double") / F.col("__t")).alias("__lp"),
    )
    per_doc = (
        stream.join(probs, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.avg("__lp"), 6).alias("__avg"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("__avg").alias("logprob"),
    )


def with_kn_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """E172: per-document INTERPOLATED KNESER-NEY bigram score — the
    smoothed-LM filter family the production pipelines actually run
    (CCNet/RedPajama gate documents on KenLM perplexity, and KenLM's
    default estimator IS interpolated modified Kneser-Ney; the plain
    conditional bigram of :func:`with_bigram_logprob` has no smoothing
    mass at all, so it cannot score text against a DIFFERENT corpus —
    any unseen transition would be -inf). Closed-form from corpus
    counts (Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.24, one fixed
    discount D):

        P_KN(w|u) = (max(c(u,w) - D, 0) + D * N1+(u.) * P_cont(w)) / c(u)
        P_cont(w) = N1+(.w) / B

    where ``N1+(u.)`` / ``N1+(.w)`` are distinct right-continuation /
    left-context type counts and ``B`` the total number of distinct
    bigram types — the continuation probability ranks words by how many
    contexts they FOLLOW, not how often they occur (the classic
    "San Francisco" effect: "francisco" is frequent but follows almost
    nothing, so its continuation mass is tiny).

    Everything derives from the SAME distinct-bigram counts frame the
    plain bigram model builds: two more tiny combinable aggregates
    (type counts per u, per w) and one broadcast scalar B — no new
    corpus-sized shuffle. Scoring joins the doc bigram stream on
    (w1, w2) exactly like E84. Every probability is strictly positive
    (the continuation term never vanishes for corpus-attested
    bigrams), so the mean log10 is always finite.

    Output: ``id_col``, ``n_bigrams``, ``kn_logprob`` (mean log10
    P_KN, 6 dp; NULL when the doc has < 2 tokens).
    """
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = F.filter(
        F.split(normalized_text(text_col), " "), lambda x: x != ""
    )
    # (r12 negative result: spread_small here measured 1.32 -> 2.26 s
    # isolated — same reason as with_bigram_logprob. Reverted.)
    base = df.withColumn("__toks", toks)
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    stream = (
        base.select(F.col(id_col), F.explode(bigrams).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"),
                F.col("__bg.w2").alias("w2"))
    )
    cnt = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c"))
    # context totals + right-continuation type counts, one pass over
    # the distinct-bigram frame
    ctx = cnt.groupBy("w1").agg(
        F.sum("__c").alias("__t"),
        F.count(F.lit(1)).alias("__fwd"),  # N1+(u.)
    )
    # left-context type counts per w2 + the global type total B
    back = cnt.groupBy("w2").agg(F.count(F.lit(1)).alias("__bwd"))
    btot = back.agg(F.sum("__bwd").alias("__B"))
    d = F.lit(float(discount))
    probs = (
        cnt.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(back), "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.log10(
                (
                    F.greatest(
                        F.col("__c").cast("double") - d, F.lit(0.0)
                    )
                    + d
                    * F.col("__fwd").cast("double")
                    * (
                        F.col("__bwd").cast("double")
                        / F.col("__B").cast("double")
                    )
                )
                / F.col("__t").cast("double")
            ).alias("__lp"),
        )
    )
    per_doc = (
        stream.join(probs, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.avg("__lp"), 6).alias("__avg"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("__avg").alias("kn_logprob"),
    )


def winsorize(
    df: DataFrame,
    col: str,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
    out_col: str | None = None,
    flag_col: str = "clipped",
) -> DataFrame:
    """Winsorize a numeric column: clamp values outside the
    [``lower_p``, ``upper_p``] exact interpolated percentiles and flag
    the clamped rows — the standard outlier treatment before a numeric
    feature feeds training or aggregate statistics (a single corrupt
    sensor reading otherwise owns the mean).

    Shape: ONE scalar aggregate computes both cut points (exact
    ``percentile``; swap ``approx_percentile`` at 100 TB — t-digest,
    map-side combinable, same plan), crossJoin-broadcast back onto the
    stream (in-plan, no driver collect), then pure codegen
    least/greatest. NULLs pass through unclamped and unflagged."""
    if not 0.0 <= lower_p < upper_p <= 1.0:
        raise ValueError(
            f"need 0 <= lower_p < upper_p <= 1, got {lower_p}, {upper_p}"
        )
    out_col = out_col or f"{col}_w"
    c = F.col(col).cast("double")
    cuts = df.agg(
        F.percentile(c, F.lit(lower_p)).alias("__lo"),
        F.percentile(c, F.lit(upper_p)).alias("__hi"),
    )
    clamped = F.least(F.greatest(c, F.col("__lo")), F.col("__hi"))
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            out_col, F.when(c.isNull(), F.lit(None)).otherwise(clamped)
        )
        .withColumn(
            flag_col,
            F.when(c.isNull(), F.lit(False)).otherwise(
                (c < F.col("__lo")) | (c > F.col("__hi"))
            ),
        )
        .drop("__lo", "__hi")
    )


def vocab_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """Distribution-drift report between two corpus snapshots: the
    ``k`` terms contributing most to the Jensen-Shannon-style
    divergence of the two unigram distributions — the monitoring pass
    that catches a crawl gone wrong (new boilerplate flooding in, a
    source vanishing, language mix shifting) BEFORE the data trains
    anything.

    Per term: smoothed probabilities ``p = (c_a + α) / (N_a + α·V)``,
    ``q`` likewise (add-α over the UNION vocabulary, so terms absent
    on one side are defined), contribution
    ``p·ln(2p/(p+q)) + q·ln(2q/(p+q))`` (symmetric, ≥ 0), rounded to
    9 dp for engine-exact ranking with a term tie-break.

    Shape: one combinable count shuffle per side, full-outer join on
    the term (vocab-sized), scalar totals crossJoin-broadcast in-plan,
    top-k via ``TakeOrderedAndProject`` — nothing bigger than the
    vocabulary ever moves."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def counts(df, name):
        # (r12 negative result: spread_small per side measured
        # 0.52 -> 1.18 s isolated — two text-payload shuffles for two
        # already-combinable count aggregations. Reverted.)
        words = df.select(
            F.explode(F.split(normalized_text(text_col), " ")).alias("term")
        ).where(F.col("term") != "")
        return words.groupBy("term").agg(F.count(F.lit(1)).alias(name))

    ca, cb = counts(df_a, "c_a"), counts(df_b, "c_b")
    joined = ca.join(cb, on="term", how="full_outer").select(
        "term",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    totals = joined.agg(
        F.sum("c_a").alias("__na"),
        F.sum("c_b").alias("__nb"),
        F.count(F.lit(1)).alias("__v"),
    )
    j = joined.crossJoin(F.broadcast(totals))
    p = (F.col("c_a") + F.lit(alpha)) / (
        F.col("__na") + F.lit(alpha) * F.col("__v")
    )
    q = (F.col("c_b") + F.lit(alpha)) / (
        F.col("__nb") + F.lit(alpha) * F.col("__v")
    )
    contrib = p * F.log(F.lit(2.0) * p / (p + q)) + q * F.log(
        F.lit(2.0) * q / (p + q)
    )
    return (
        j.select(
            "term", "c_a", "c_b",
            F.round(contrib, 9).alias("js_contrib"),
        )
        .orderBy(F.desc("js_contrib"), "term")
        .limit(k)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information over
    adjacent token pairs: ``PMI(x,y) = ln(c(x,y)·N / (c(x,·)·c(·,y)))``
    with slot marginals (c(x,·) = bigrams starting with x, c(·,y) =
    bigrams ending with y, N = total bigrams) — the self-consistent
    bigram-table convention, so PMI is exactly the log pointwise lift
    of the observed pair over independence of its slots. The
    phrase-mining primitive ("machine learning" scores high because the
    pair beats the product of its parts; "of the" is frequent but NOT
    informative and scores ~0).

    ``min_count`` is the standard PMI variance guard (rare pairs
    otherwise dominate: a 1-occurrence pair of 1-occurrence words
    maxes the statistic). All counts are exact integers off ONE
    combinable (w1, w2) shuffle (marginals derive from the counts
    table — two tiny shuffles, never a second corpus pass); the PMI
    expression is a single double computation in a fixed operand
    order, so both engines agree bit-for-bit. Returns
    ``(w1, w2, n_xy, pmi)`` ordered (pmi desc, w1, w2), pmi at 6 dp."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.filter(
        F.split(normalized_text(text_col), " "), lambda x: x != ""
    )
    # (r12 negative result: spread_small here measured 0.83 -> 1.44 s
    # isolated — same text-payload-shuffle reason as the bigram LMs.
    # Reverted.)
    base = df.withColumn("__toks", toks)
    t = F.col("__toks")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    stream = base.select(F.explode(bigrams).alias("__bg")).select(
        F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2")
    )
    cnt = stream.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    left = cnt.groupBy("w1").agg(F.sum("n_xy").alias("__nx"))
    right = cnt.groupBy("w2").agg(F.sum("n_xy").alias("__ny"))
    total = cnt.agg(F.sum("n_xy").alias("__n"))
    scored = (
        cnt.where(F.col("n_xy") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__pmi",
            F.log(
                (F.col("n_xy").cast("double") * F.col("__n").cast("double"))
                / (F.col("__nx").cast("double") * F.col("__ny").cast("double"))
            ),
        )
    )
    return (
        scored.orderBy(F.desc("__pmi"), "w1", "w2")
        .limit(k)
        .select(
            "w1", "w2",
            F.col("n_xy").cast("long").alias("n_xy"),
            F.round("__pmi", 6).alias("pmi"),
        )
    )


def corpus_card(
    df: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
) -> DataFrame:
    """E180: per-slice corpus card — the datasheet rollup every corpus
    release ships (n docs, exact-duplicate rate, char volume + share,
    length quantiles-ish via mean, whitespace-token volume) computed
    per grouping slice (source × lang here) in ONE pass + one tiny
    re-aggregate for the global share.

    The dup rate is the exact-hash tier (md5 of the raw text —
    dedup.py's key): ``1 - distinct_texts / n_docs``. Spark counts
    distinct md5s (map-side partial, HLL-free exact count per slice —
    slices are few); the oracle mirrors with COUNT(DISTINCT md5(text)).

    Scale shape: one groupBy over |slices| keys with combinable
    aggregates; the global total for char_share is a broadcast of a
    1-row aggregate. No window, no second scan of the text.
    """
    t = F.col(text_col)
    # (r12 negative result: spread_small measured 0.46 -> 0.88 s
    # isolated — the combinable groupBy already map-side-reduces on the
    # scan task; the text-payload shuffle is pure overhead. Reverted.)
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(t)).alias("__distinct"),
        F.sum(F.length(t)).cast("long").alias("n_chars_total"),
        F.sum(F.size(ws_tokens(t))).cast("long").alias("n_ws_tokens"),
        F.round(F.avg(F.length(t)), 6).alias("mean_chars"),
    )
    total = per.agg(
        F.sum("n_chars_total").cast("double").alias("__tot")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            *group_cols,
            "n_docs",
            F.round(
                1.0 - F.col("__distinct") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            "n_chars_total",
            F.round(F.col("n_chars_total") / F.col("__tot"), 6).alias(
                "char_share"
            ),
            "mean_chars",
            "n_ws_tokens",
        )
    )


def corpus_card_state(
    df: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
) -> "tuple[DataFrame, DataFrame]":
    """E183: state for INCREMENTAL corpus-card maintenance — the E180
    datasheet kept current per ingest batch in O(batch), never
    rescanning the corpus (the minhash-corpus-index economics applied
    to release reporting). State is two frames:

    * ``aggs``: per-slice additive sums ``(group..., n_docs,
      n_distinct, n_chars_total, n_ws_tokens)`` — every column a
      monoid, so batch deltas FOLD;
    * ``hashes``: the distinct ``(group..., __h)`` text-md5 table —
      what makes the duplicate count incrementable exactly (a new
      batch's contribution to n_distinct is its anti-join against
      this table). Persist it bucketed by ``__h`` at scale; the
      per-batch anti-join then prunes to touched buckets.
    """
    t = F.col(text_col)
    # NULL texts hash to NULL; countDistinct ignores NULLs, and a NULL
    # key never matches in the apply-batch anti-join (each batch would
    # re-count it as new) — keep NULL keys out of the hash table so the
    # fold ≡ recompute law holds on NULL-text rows (ADVICE r11).
    hashes = (
        df.select(*group_cols, F.md5(t).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    aggs = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # non-NULL text count: the mean_chars denominator — E180's
        # avg(length) excludes NULL texts, so the state must carry
        # the matching count for fold ≡ recompute to hold on
        # mean_chars too (r12; surfaced by the streaming twin test)
        F.count(t).alias("n_text_docs"),
        F.countDistinct(F.md5(t)).alias("n_distinct"),
        F.sum(F.length(t)).cast("long").alias("n_chars_total"),
        F.sum(F.size(ws_tokens(t))).cast("long").alias("n_ws_tokens"),
    )
    return aggs, hashes


def corpus_card_apply_batch(
    aggs: DataFrame,
    hashes: DataFrame,
    batch: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
) -> "tuple[DataFrame, DataFrame]":
    """Fold one ingest batch into the corpus-card state, O(batch):
    batch aggregates are one combinable groupBy over batch rows; the
    distinct increment is the batch's collapsed hash set anti-joined
    against the state's hash table (never a corpus rescan); the new
    state is a full-outer coalesce-sum (a slice appearing only in the
    batch enters with its batch values). Refresh-equivalence law
    (fold(batches) ≡ recompute(corpus)) is pytest-pinned."""
    t = F.col(text_col)
    b_aggs = batch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__d_docs"),
        F.count(t).alias("__d_text"),
        F.sum(F.length(t)).cast("long").alias("__d_chars"),
        F.sum(F.size(ws_tokens(t))).cast("long").alias("__d_ws"),
    )
    b_hashes = (
        batch.select(*group_cols, F.md5(t).alias("__h"))
        .where(F.col("__h").isNotNull())  # mirror corpus_card_state
        .distinct()
    )
    new_hashes = b_hashes.join(
        hashes, [*group_cols, "__h"], "left_anti"
    )
    b_distinct = new_hashes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__d_distinct")
    )
    delta = b_aggs.join(b_distinct, group_cols, "left")
    merged = aggs.join(delta, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce("n_docs", F.lit(0))
            + F.coalesce("__d_docs", F.lit(0))
        ).alias("n_docs"),
        (
            F.coalesce("n_text_docs", F.lit(0))
            + F.coalesce("__d_text", F.lit(0))
        ).alias("n_text_docs"),
        (
            F.coalesce("n_distinct", F.lit(0))
            + F.coalesce("__d_distinct", F.lit(0))
        ).alias("n_distinct"),
        (
            F.coalesce("n_chars_total", F.lit(0))
            + F.coalesce("__d_chars", F.lit(0))
        ).alias("n_chars_total"),
        (
            F.coalesce("n_ws_tokens", F.lit(0))
            + F.coalesce("__d_ws", F.lit(0))
        ).alias("n_ws_tokens"),
    )
    return merged, hashes.unionByName(new_hashes)


def corpus_card_state_write(
    df: DataFrame,
    group_cols: "list[str]",
    name: str,
    text_col: str = "text",
    num_buckets: int = 32,
) -> None:
    """Persist the E183 state as catalog tables — the one-time layout
    job for incremental corpus reporting: ``{name}_aggs`` (|slices|
    rows, plain overwrite) and ``{name}_hashes`` (the distinct text-md5
    table) BUCKETED + sorted on the fold's full anti-join key
    ``(group…, __h)``. The bucket layout is what the per-batch fold's
    anti-join consumes exchange-free: the bucketed scan's
    HashPartitioning matches the join's required distribution exactly,
    so the corpus-sized side is read in place — never shuffled — on
    every subsequent fold, and only the O(batch) side pays an exchange
    (same economics as the MinHash corpus index, minhash_index.py).

    A ``{name}_meta`` table records (group_cols, text_col,
    num_buckets) so a FRESH session can re-attach the state from its
    on-disk files (the in-memory catalog dies with the session;
    stale orphaned locations are purged first — the minhash-index
    session-lifecycle discipline)."""
    from mysql_syncer_spark.operators.minhash_index import _drop_stale
    from mysql_syncer_spark.sources.bucketed import write_bucketed

    spark = df.sparkSession
    for suf in ("_aggs", "_hashes", "_meta"):
        _drop_stale(spark, f"{name}{suf}")
    aggs, hashes = corpus_card_state(df, group_cols, text_col)
    write_bucketed(
        hashes, f"{name}_hashes", [*group_cols, "__h"], num_buckets
    )
    aggs.write.mode("overwrite").saveAsTable(f"{name}_aggs")
    spark.createDataFrame(
        [(",".join(group_cols), text_col, num_buckets)],
        "group_cols string, text_col string, num_buckets int",
    ).write.mode("overwrite").saveAsTable(f"{name}_meta")


def corpus_card_state_read(
    spark, name: str
) -> "tuple[DataFrame, DataFrame]":
    """(aggs, hashes) handles over the persisted state tables —
    re-attaching them from their on-disk files first when this is a
    fresh session (bucket spec restored from ``{name}_meta``)."""
    from mysql_syncer_spark.operators.minhash_index import (
        _reattach_table,
    )

    if not _reattach_table(spark, f"{name}_meta"):
        raise ValueError(f"no corpus-card state named {name!r}")
    meta = spark.table(f"{name}_meta").first()
    gcols = meta["group_cols"].split(",")
    nb = meta["num_buckets"]
    bcols = ", ".join(f"`{c}`" for c in [*gcols, "__h"])
    ok = _reattach_table(spark, f"{name}_aggs") and _reattach_table(
        spark,
        f"{name}_hashes",
        f"CLUSTERED BY ({bcols}) SORTED BY ({bcols}) INTO {nb} BUCKETS",
    )
    if not ok:
        raise ValueError(f"corpus-card state {name!r} is incomplete")
    return spark.table(f"{name}_aggs"), spark.table(f"{name}_hashes")


def corpus_card_fold_plan(
    spark,
    name: str,
    batch: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
) -> DataFrame:
    """The fold's new-hash anti-join AS A PLAN (un-executed) — exposed
    so the bench lane can assert the scale property mechanically: the
    ``{name}_hashes`` scan must appear bucketed with no Exchange above
    it (only the O(batch) side shuffles)."""
    t = F.col(text_col)
    b_hashes = (
        batch.select(*group_cols, F.md5(t).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    _, hashes = corpus_card_state_read(spark, name)
    return b_hashes.join(hashes, [*group_cols, "__h"], "left_anti")


def corpus_card_state_fold(
    spark,
    name: str,
    batch: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
    num_buckets: int = 32,
) -> None:
    """Fold one ingest batch into the PERSISTED state — the production
    form of :func:`corpus_card_apply_batch` (same algebra, law-shared):
    per-batch cost is the batch's own groupBy plus one anti-join whose
    corpus-sized side is the bucketed hash table read exchange-free
    (a column-pruned scan of one md5 column — the thing that stays
    cheap while the corpus grows is that NOTHING corpus-sized ever
    shuffles or rewrites). The hash table grows by APPEND (only the
    batch's genuinely-new hashes are written, in the same bucket
    layout); the |slices|-row aggs table is overwritten. New-hash and
    merged-aggs frames are materialized (localCheckpoint) BEFORE
    either write so the reads underneath them see pre-append state."""
    from mysql_syncer_spark.sources.bucketed import write_bucketed

    t = F.col(text_col)
    new_hashes = corpus_card_fold_plan(
        spark, name, batch, group_cols, text_col
    ).transform(pin)
    b_aggs = batch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__d_docs"),
        F.count(t).alias("__d_text"),
        F.sum(F.length(t)).cast("long").alias("__d_chars"),
        F.sum(F.size(ws_tokens(t))).cast("long").alias("__d_ws"),
    )
    b_distinct = new_hashes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__d_distinct")
    )
    delta = b_aggs.join(b_distinct, group_cols, "left")
    aggs_tbl, _ = corpus_card_state_read(spark, name)
    merged = (
        aggs_tbl
        .join(delta, group_cols, "full_outer")
        .select(
            *group_cols,
            (
                F.coalesce("n_docs", F.lit(0))
                + F.coalesce("__d_docs", F.lit(0))
            ).alias("n_docs"),
            (
                F.coalesce("n_text_docs", F.lit(0))
                + F.coalesce("__d_text", F.lit(0))
            ).alias("n_text_docs"),
            (
                F.coalesce("n_distinct", F.lit(0))
                + F.coalesce("__d_distinct", F.lit(0))
            ).alias("n_distinct"),
            (
                F.coalesce("n_chars_total", F.lit(0))
                + F.coalesce("__d_chars", F.lit(0))
            ).alias("n_chars_total"),
            (
                F.coalesce("n_ws_tokens", F.lit(0))
                + F.coalesce("__d_ws", F.lit(0))
            ).alias("n_ws_tokens"),
        )
        .transform(pin)
    )
    write_bucketed(
        new_hashes,
        f"{name}_hashes",
        [*group_cols, "__h"],
        num_buckets,
        mode="append",
    )
    merged.write.mode("overwrite").saveAsTable(f"{name}_aggs")
    for suf in ("_aggs", "_hashes"):
        spark.catalog.refreshTable(f"{name}{suf}")


def corpus_card_from_state(
    aggs: DataFrame, group_cols: "list[str]"
) -> DataFrame:
    """Render the E180 card from maintained state: same columns, same
    rounding — ``corpus_card(corpus) ≡ corpus_card_from_state(folded
    state)`` by construction (both derive from the same sums)."""
    total = aggs.agg(
        F.sum("n_chars_total").cast("double").alias("__tot")
    )
    return aggs.crossJoin(F.broadcast(total)).select(
        *group_cols,
        "n_docs",
        F.round(
            1.0 - F.col("n_distinct") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        "n_chars_total",
        F.round(F.col("n_chars_total") / F.col("__tot"), 6).alias(
            "char_share"
        ),
        # avg(length) semantics: NULL texts are excluded from BOTH
        # sides of the mean; an all-NULL slice yields NULL (not NaN)
        F.when(
            F.col("n_text_docs") > 0,
            F.round(
                F.col("n_chars_total")
                / F.col("n_text_docs").cast("double"),
                6,
            ),
        ).alias("mean_chars"),
        "n_ws_tokens",
    )


def ngram_diversity(
    df: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
) -> DataFrame:
    """E189: per-slice lexical diversity audit — type-token ratios at
    the unigram and bigram grain (the cheap template/boilerplate
    detector: a source whose bigram TTR collapses while its unigram
    TTR holds is stamping the same phrases from a normal vocabulary —
    exactly the synthetic/spam signature n-gram frequency lists
    miss): per group ``(n_tokens, n_types, ttr, n_bigrams,
    n_bigram_types, bigram_ttr)``.

    Tokenization is the whitespace grain shared with the rest of the
    repo (``ws_tokens``); bigrams join adjacent tokens with a single
    space. Ratios are integer/integer, divided once and rounded — no
    float sums to order.

    Scale shape: one explode per grain feeding a count-distinct
    aggregate on (group, gram) then a |groups|-sized fold — Spark
    rewrites the countDistinct into a two-level partial aggregate, so
    the gram fan-out is combined map-side before the one shuffle. No
    window, no join, nothing doc-sized on the driver."""
    t = F.col(text_col)
    # (r12 negative result: spread_small on the projected scan measured
    # 0.84 -> 1.19 s isolated — the countDistinct partial aggregation
    # dominates, not the single-task tokenize. Reverted.)
    toks = df.select(*group_cols, ws_tokens(t).alias("__ts"))
    uni = (
        toks.select(*group_cols, F.explode("__ts").alias("__g"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("__g").cast("long").alias("n_types"),
        )
    )
    bg = (
        toks.select(
            *group_cols,
            F.explode(
                # empty-token docs: slice length would be -1 (ANSI
                # error) — emit no bigrams instead
                F.expr(
                    "CASE WHEN size(__ts) >= 2 THEN "
                    "transform(slice(__ts, 1, size(__ts) - 1), "
                    "(x, i) -> concat(x, ' ', __ts[i + 1])) "
                    "ELSE cast(array() as array<string>) END"
                )
            ).alias("__g"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.countDistinct("__g").cast("long").alias("n_bigram_types"),
        )
    )
    return (
        uni.join(bg, group_cols, "left")
        .select(
            *group_cols,
            "n_tokens",
            "n_types",
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_bigram_types", F.lit(0)).alias(
                "n_bigram_types"
            ),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.round(
                    F.col("n_bigram_types").cast("double")
                    / F.col("n_bigrams").cast("double"),
                    6,
                ),
            ).alias("bigram_ttr"),
        )
    )


def zipf_fit(
    df: DataFrame,
    group_cols: "list[str]",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """E192: Zipf-law fit per slice — OLS of ln(frequency) against
    ln(rank) over the top-k tokens: natural text sits near α ≈ 1 with
    a tight fit; machine-generated/templated corpora bend the curve
    (low r², or α far from 1). The complement of the TTR audit
    (E189): TTR reads the tail's WIDTH, this reads the head's SHAPE.
    Output per group: ``(group…, n_top, zipf_alpha, intercept, r2)``
    with ``zipf_alpha = −slope``.

    Determinism: ranks are (count DESC, token ASC) — exact integer
    ordering; the regression runs over ≤ top_k (count, rank) pairs of
    exact integers through the closed-form regr aggregates (double
    sums over ≤ k values; rounded to the repo's standing 6 dp).

    Scale shape: one combinable (group, token) count shuffle, a
    per-group top-k window over the TOKEN-GRAIN rows (bounded by
    vocabulary, not corpus), then a |groups|-sized regr fold."""
    from pyspark.sql import Window

    if top_k < 3:
        raise ValueError("top_k must be >= 3")
    t = F.col(text_col)
    counts = (
        # (r12 negative result: spread_small measured 0.50 -> 0.71 s
        # isolated — the (group, token) count shuffle dominates.
        # Reverted.)
        df.select(
            *group_cols,
            F.explode(ws_tokens(F.lower(t))).alias("__tok"),
        )
        .groupBy(*group_cols, "__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cnt").desc(), F.col("__tok")
    )
    top = counts.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= top_k
    )
    return (
        top.select(
            *group_cols,
            F.log(F.col("__rk").cast("double")).alias("__x"),
            F.log(F.col("__cnt").cast("double")).alias("__y"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_top"),
            F.round(-F.regr_slope("__y", "__x"), 6).alias("zipf_alpha"),
            F.round(F.regr_intercept("__y", "__x"), 6).alias(
                "intercept"
            ),
            F.round(F.regr_r2("__y", "__x"), 6).alias("r2"),
        )
    )
