"""Cross-document duplicated-SPAN extraction (exact-substring dedup).

The third tier of the cross-doc scrub family. `operators/lines.py`
removes corpus-frequent token windows (tiled spans E57; stride-sampled
sliding windows E115), but (a) stride sampling only matches copies
whose relative shift is ≡ 0 (mod stride) — two copies of the same
boilerplate offset by 2 tokens under stride 4 never materialize the
same window — and (b) neither reports the duplication itself: the
MAXIMAL character ranges that appear verbatim in other documents,
which is what Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better") compute with a suffix array and remove from
every copy.

This module restates that semantics Spark-first, in two tiers:

* **Exact tier** (`winnow_w=None`): every character k-gram of every
  document is materialized; a k-gram whose corpus document-frequency
  reaches ``min_docs`` marks its window [pos, pos+k) duplicated; the
  marked windows of a document merge into maximal spans by the classic
  gaps-and-islands fold (a duplicated substring of length L >= k is
  covered end-to-end by its L-k+1 duplicated k-grams, so the merged
  island IS the maximal duplicated span — the suffix-array answer
  without the suffix array). Corpus restated ~k×: the honest exact
  cost, kept STRING-keyed for byte-exact DuckDB oracle parity.

* **Winnowing tier** (`winnow_w=w`): content-defined fingerprint
  selection (Schleimer et al. 2003, the MOSS algorithm): hash every
  k-gram, slide a window of w consecutive hashes, keep the RIGHTMOST
  MINIMUM of each window. Selection depends only on local content, so
  — unlike fixed-stride sampling — both copies of a shared region
  select the SAME positions relative to the content, at ANY alignment:
  every shared substring of length >= w+k-1 is guaranteed detected,
  and ~2/(w+1) of positions are kept (the published density bound).
  At 100 TB this is the scale path: the shuffle carries 8-byte
  xxhash64 fingerprints at 2/(w+1) density instead of k-byte strings
  at density 1 — a ~k·(w+1)/16 reduction in shuffle bytes. Spans
  merged from winnowed hits have boundary fuzz < w+k-1 per end
  (documented; the guarantee is detection, not exact boundaries).

Spark shape (pure built-in codegen, zero Python rows):

1. per-doc k-gram hash array via ``transform(sequence(...))`` — no
   explode until after selection in the winnowed tier;
2. winnowing = nested higher-order functions with the hash array
   bound as a lambda variable (substitution-proof — see the note in
   ``winnow_fingerprints``): per window, rightmost min via
   slice/reverse/array_position (ties break right — robust winnowing);
3. document frequency = two map-side-combinable shuffles (distinct on
   (gram, doc), count per gram);
4. duplicated-gram hits come back via a semi join keyed on the gram
   (AQE-sized; never broadcast — the duplicated set is data-dependent);
5. islands: one window-function pass per doc (lag + running sum), one
   groupBy — both shuffle on the doc id only.

Reference anchor: generalizes the reference's row-hash set-compare
(Synchronizer.php:88-118 — hash rows, diff the hash sets) from whole
rows to intra-document character ranges; the winnowing tier is the
same "hash then compare the hash sets" idea under a content-defined
sampler. Everything else is training-pipeline surface beyond the
reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

from mysql_syncer_spark.operators.spread import spread_small


def kgram_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Every character k-gram of every document: one row per position.

    Output: ``id_col``, ``pos`` (0-based char offset, long), ``gram``
    (the k-char substring). Docs shorter than k produce no rows; NULL
    text behaves as empty. This is the exact tier's fan-out — the
    corpus restated ~k× — so callers at scale should prefer
    :func:`winnow_fingerprints`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    return (
        # ~n_chars substr rows explode per doc above any exchange —
        # spread a small corpus so the fan-out is not serialized on
        # the scan's task count (spread.py; no-op at scale)
        spread_small(df).select(F.col(id_col), txt.alias("__t"), n.alias("__n"))
        .where(F.col("__n") >= k)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0).cast("long"), (F.col("__n") - k).cast("long"))
            ).alias("pos"),
            "__t",
        )
        .select(
            id_col,
            "pos",
            F.col("__t").substr((F.col("pos") + 1).cast("int"), F.lit(k)).alias("gram"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
) -> DataFrame:
    """Robust-winnowing fingerprint selection (Schleimer et al. 2003).

    Hashes every char k-gram with xxhash64, slides a window of ``w``
    consecutive hashes, keeps the rightmost minimum of each window.
    Output: ``id_col``, ``pos`` (0-based gram offset, long), ``fp``
    (the selected gram's xxhash64, long). Guarantees: any substring
    of length >= w+k-1 shared verbatim by two documents selects the
    same fingerprints at the same content-relative positions in both;
    expected density of selected positions is 2/(w+1).

    Docs shorter than w+k-1 chars have no full window and produce no
    rows (they cannot contain a guaranteed-detectable match anyway).
    All array work is per-document codegen (nested ``transform`` /
    ``aggregate``); the explode happens AFTER selection, so only the
    ~2/(w+1)-density fingerprints ever hit a shuffle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    m = (n - F.lit(k) + 1).cast("int")  # number of k-grams
    hashes = F.transform(
        F.sequence(F.lit(0), F.col("__m") - 1),
        lambda i: F.xxhash64(F.col("__t").substr((i + 1).cast("int"), F.lit(k))),
    )

    # Rightmost min of each window of w consecutive hashes, via JVM
    # array built-ins: array_position over the REVERSED slice finds
    # the rightmost occurrence of the window min (robust winnowing's
    # tie rule). A/B-measured ~1.4x faster than the equivalent
    # per-step aggregate fold (struct churn in the HOF interpreter);
    # the slices are O(m·w) transient longs per doc — fine through
    # ~100 KB docs, and the aggregate formulation (git history) is the
    # O(w)-memory fallback if ever needed for megabyte docs.
    def _selected(h):
        slices = F.transform(
            F.sequence(F.lit(0), F.size(h) - w),
            lambda i: F.slice(h, i + 1, w),
        )
        winners = F.transform(
            slices,
            lambda s, idx: (
                idx + w - F.array_position(F.reverse(s), F.array_min(s))
            ).cast("long"),
        )
        return F.transform(
            F.array_distinct(winners),
            lambda p: F.struct(
                p.alias("pos"),
                F.element_at(h, (p + 1).cast("int")).alias("fp"),
            ),
        )

    # The hash array is bound as a LAMBDA VARIABLE (single-element
    # array → transform → flatten), never as a named projection the
    # optimizer can substitute: CollapseProject inlines an aliased
    # array expression into EVERY element access of a downstream
    # nested-HOF consumer under column pruning (e.g. a bare .count()),
    # re-deriving the whole hash array per window — a measured
    # O(m^2·w) blowup (jstack: ArrayTransform-inside-ArrayTransform
    # re-hashing every substring). Lambda-variable references cannot
    # be substituted, so the array is computed exactly once per row
    # under every downstream plan shape.
    selected = F.flatten(F.transform(F.array(hashes), _selected))
    base = (
        # the per-doc hash/winnow arrays are the heavy map stage —
        # spread a small corpus first (no-op at scale, spread.py)
        spread_small(df)
        .select(F.col(id_col), txt.alias("__t"), m.alias("__m"))
        .where(F.col("__m") >= w)
        .select(id_col, selected.alias("__sel"))
    )
    # explode_OUTER on purpose: plain explode triggers
    # InferFiltersFromGenerate, whose size() > 0 filter re-derives the
    # whole selection expression inside a pushed-down filter (the same
    # blowup through a different door); the outer variant is exempt,
    # and the null-row filter below runs on the generated attribute,
    # recomputing nothing.
    return (
        base.select(id_col, F.explode_outer("__sel").alias("__s"))
        .where(F.col("__s").isNotNull())
        .select(
            id_col,
            F.col("__s")["pos"].alias("pos"),
            F.col("__s")["fp"].alias("fp"),
        )
    )


def _merge_islands(
    hits: DataFrame, id_col: str, k: int, merge_gap: int
) -> DataFrame:
    """Gaps-and-islands fold: merge duplicated windows [pos, pos+k)
    into maximal spans. ``hits`` must have distinct (id, pos) rows.
    Two consecutive hits merge while pos <= prev_pos + merge_gap."""
    wdw = Window.partitionBy(id_col).orderBy("pos")
    run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = hits.withColumn(
        "__new",
        F.when(
            F.col("pos") > F.lag("pos").over(wdw) + merge_gap, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn("__gid", F.sum("__new").over(run))
    return (
        marked.groupBy(id_col, "__gid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("span_len"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_docs: int = 2,
    winnow_w: int | None = None,
) -> DataFrame:
    """Maximal character spans duplicated verbatim across >= min_docs
    documents (Lee et al. 2022 exact-substring-dedup semantics).

    Output: ``id_col``, ``span_start``, ``span_end`` (0-based,
    end-exclusive char offsets), ``span_len`` — one row per maximal
    duplicated span per document, EVERY copy reported (Lee et al.
    remove all copies, not all-but-one).

    ``winnow_w=None``: exact tier — spans are precisely the maximal
    substrings of length >= k shared with another document.
    ``winnow_w=w``: winnowed scale tier — every shared span of length
    >= w+k-1 is detected; reported boundaries snap to selected
    fingerprints (fuzz < w+k-1 per end), and hits closer than
    k+w-1 chars merge (a shared region selects a fingerprint at least
    every w positions, so intra-span gaps never split an island).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if winnow_w is None:
        grams = kgram_positions(df, text_col, id_col, k)
        key = "gram"
        merge_gap = k
    else:
        grams = winnow_fingerprints(df, text_col, id_col, k, winnow_w)
        key = "fp"
        merge_gap = k + winnow_w - 1
    dup = (
        grams.select(key, id_col)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select(key)
    )
    hits = grams.join(dup, on=key, how="left_semi").select(id_col, "pos")
    return _merge_islands(hits, id_col, k, merge_gap)


def _cut_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str,
) -> DataFrame:
    """Shared scrub kernel: cut ``spans`` (non-overlapping, per-doc)
    out of ``df``'s text and stitch the remainder in original order.
    The cut is array work on the doc's own (small) span list: spans
    per doc are collected with ``collect_list`` — bounded by
    doc_len/k, document-sized, never corpus-sized — then a single
    ``aggregate`` fold walks the sorted spans emitting the kept
    pieces. One extra shuffle on the doc id for the join back. Every
    input row survives; rows with no span (or NULL text) pass through
    verbatim."""
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = df.join(per_doc, on=id_col, how="left")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    # fold: acc = (clean text so far, cursor); each span appends
    # txt[cursor:start) and advances the cursor to end.
    fold = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit("").alias("acc"), F.lit(0).cast("long").alias("cur")),
        lambda acc, s: F.struct(
            F.concat(
                acc["acc"],
                txt.substr(
                    (acc["cur"] + 1).cast("int"),
                    (s["span_start"] - acc["cur"]).cast("int"),
                ),
            ).alias("acc"),
            s["span_end"].alias("cur"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            txt.substr(
                (acc["cur"] + 1).cast("int"),
                (F.length(txt) - acc["cur"]).cast("int"),
            ),
        ),
    )
    clean = F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(fold)
    return (
        joined.withColumn(out_col, clean)
        .withColumn(
            "n_chars_removed",
            F.coalesce(
                F.aggregate(
                    "__spans",
                    F.lit(0).cast("long"),
                    lambda acc, s: acc + (s["span_end"] - s["span_start"]),
                ),
                F.lit(0).cast("long"),
            ),
        )
        .drop("__spans")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_docs: int = 2,
    winnow_w: int | None = None,
    out_col: str = "text_clean",
) -> DataFrame:
    """Cut every duplicated span out of every document (all copies,
    per Lee et al. 2022) and stitch the remainder in original order.
    Output: all input columns plus ``out_col``, ``n_chars_removed``
    (see :func:`_cut_spans` for the fold's shape)."""
    spans = duplicate_spans(df, text_col, id_col, k, min_docs, winnow_w)
    return _cut_spans(df, spans, text_col, id_col, out_col)


# ---------------------------------------------------------------------------
# Persisted span-fingerprint index: fingerprint the corpus ONCE,
# ingest O(batch) — the E45 economics applied to exact-substring dedup.
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class SpanIndex(NamedTuple):
    """Handle on a persisted winnowed-fingerprint index.

    ``fingerprints`` is ``(fp long, id, pos)`` bucketed by ``fp``:
    the batch-vs-corpus semi join reads the corpus side pre-partitioned
    on the join key — ZERO Exchange on the (100 TB) corpus side; only
    the batch's fingerprints shuffle.
    """

    fingerprints: "DataFrame"
    id_col: str
    k: int
    w: int
    num_buckets: int


def span_index_write(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    w: int = 8,
    num_buckets: int = 32,
) -> None:
    """Winnow the corpus once and persist the fingerprints bucketed by
    ``fp`` (+ a one-row meta table so reads can never silently mix
    (k, w) families). Without an index, every incoming batch re-scans
    the whole corpus (duplicate_spans on corpus+batch); with it, the
    daily ingest cost is O(batch) forever."""
    from mysql_syncer_spark.operators.minhash_index import _drop_stale
    from mysql_syncer_spark.sources.bucketed import write_bucketed

    spark = corpus.sparkSession
    for suf in ("_fps", "_meta"):
        _drop_stale(spark, f"{name}{suf}")
    fps = winnow_fingerprints(corpus, text_col, id_col, k, w)
    write_bucketed(fps, f"{name}_fps", ["fp"], num_buckets)
    meta = spark.createDataFrame(
        [(id_col, k, w, num_buckets)],
        "id_col string, k int, w int, num_buckets int",
    )
    meta.write.mode("overwrite").saveAsTable(f"{name}_meta")


def span_index_exists(spark, name: str) -> bool:
    """True iff usable from THIS session (registered or re-attachable
    from on-disk files — fresh session after an index-build elsewhere)."""
    from mysql_syncer_spark.operators.minhash_index import _reattach_table

    if not _reattach_table(spark, f"{name}_meta"):
        return False
    nb = spark.table(f"{name}_meta").first()["num_buckets"]
    return _reattach_table(
        spark,
        f"{name}_fps",
        f"CLUSTERED BY (fp) INTO {nb} BUCKETS",
    )


def span_index_read(spark, name: str) -> SpanIndex:
    if not span_index_exists(spark, name):
        raise ValueError(
            f"span index {name!r} not found: neither registered in this "
            "session nor present on disk — run span_index_write first"
        )
    meta = spark.table(f"{name}_meta").first()
    return SpanIndex(
        fingerprints=spark.table(f"{name}_fps"),
        id_col=meta["id_col"],
        k=meta["k"],
        w=meta["w"],
        num_buckets=meta["num_buckets"],
    )


def ensure_span_index(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    w: int = 8,
    num_buckets: int = 32,
) -> SpanIndex:
    """Read if present (this session or re-attachable), else build.
    Parameter mismatches against the persisted meta raise loudly."""
    spark = corpus.sparkSession
    if not span_index_exists(spark, name):
        span_index_write(corpus, name, id_col, text_col, k, w, num_buckets)
    idx = span_index_read(spark, name)
    if (idx.id_col, idx.k, idx.w) != (id_col, k, w):
        raise ValueError(
            f"span index {name!r} was built with "
            f"{(idx.id_col, idx.k, idx.w)}, requested "
            f"{(id_col, k, w)} — use a parameter-distinct name"
        )
    return idx


def duplicate_spans_against_index(
    batch: DataFrame,
    index: SpanIndex,
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """Duplicated spans of the BATCH docs against (corpus index ∪ the
    batch itself), O(batch) — never re-fingerprints the corpus.

    Exactly equals ``duplicate_spans(corpus ∪ batch, winnow_w=w)``
    restricted to the batch's ids, PROVIDED batch and corpus ids are
    disjoint (pytest-proven): a batch window is duplicated iff its
    fingerprint exists anywhere in the corpus (>= 1 corpus doc + this
    batch doc = 2 docs) or in >= 2 distinct batch docs. Content-defined
    selection makes the comparison alignment-independent: both sides of
    a shared region select the same fingerprints, so the >= w+k-1
    detection guarantee holds against the index too.

    Plan: batch fingerprints (codegen) → ONE semi join whose corpus
    side is the fp-bucketed table (no corpus Exchange) → batch-local
    document-frequency groupBy (batch-sized) → islands merge.
    """
    id_col = id_col or index.id_col
    bfp = winnow_fingerprints(batch, text_col, id_col, index.k, index.w)
    corpus_hits = bfp.join(
        index.fingerprints.select("fp"), on="fp", how="left_semi"
    ).select(id_col, "pos")
    batch_dup = (
        bfp.select("fp", id_col)
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= 2)
        .select("fp")
    )
    batch_hits = bfp.join(batch_dup, on="fp", how="left_semi").select(
        id_col, "pos"
    )
    hits = corpus_hits.unionByName(batch_hits).distinct()
    return _merge_islands(hits, id_col, index.k, index.k + index.w - 1)


def span_index_append(
    name: str,
    batch: DataFrame,
    index: SpanIndex,
    text_col: str = "text",
) -> None:
    """Fold an admitted batch into the index (bucketed append, same
    layout): tomorrow's ingest dedups against today's admissions too.
    Lineage is cut up front — batches are small by definition."""
    from mysql_syncer_spark.sources.bucketed import write_bucketed

    fps = winnow_fingerprints(
        batch.transform(pin),
        text_col,
        index.id_col,
        index.k,
        index.w,
    )
    write_bucketed(
        fps, f"{name}_fps", ["fp"], index.num_buckets, mode="append"
    )


def duplication_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Per-document duplication profile (exact tier): what fraction of
    a doc's k-grams appear verbatim in at least one OTHER document.
    The corpus-novelty admission metric — a crawl batch whose mean
    dup_fraction jumps is re-crawling known content; a doc near 1.0 is
    a copy even if no single span spans the whole doc.

    Output: ``id_col``, ``n_grams``, ``n_dup_grams``, ``dup_fraction``
    (rounded to 6 — a single IEEE division, cross-engine exact). Docs
    shorter than k report 0 grams and fraction 0.0.

    Shape: the E162 gram fan-out, one distinct + doc-frequency groupBy,
    one semi join, one per-doc count — every shuffle keyed on the gram
    or the doc id. The winnowed sibling for O(batch) scoring of an
    incoming batch is :func:`novelty_against_index`.
    """
    grams = kgram_positions(df, text_col, id_col, k)
    dup = (
        grams.select("gram", id_col)
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= 2)
        .select("gram")
    )
    per_doc = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    dup_per_doc = (
        grams.join(dup, on="gram", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .join(dup_per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.round(
                F.coalesce("n_dup_grams", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def novelty_against_index(
    batch: DataFrame,
    index: SpanIndex,
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """O(batch) novelty score for an incoming batch against the
    persisted corpus fingerprint index: fraction of each batch doc's
    WINNOWED fingerprints already present in the corpus (batch-internal
    duplication deliberately not counted — this is the "is it new vs
    the corpus" gate; compose with :func:`duplicate_spans_against_index`
    for the full picture).

    Output: ``id_col``, ``n_fps``, ``n_known_fps``, ``known_fraction``.
    Docs too short to carry a full winnowing window report 0
    fingerprints and fraction 0.0 (unknowable at this granularity).
    Same plan economics as the index join: only the batch shuffles.
    """
    id_col = id_col or index.id_col
    bfp = winnow_fingerprints(batch, text_col, id_col, index.k, index.w)
    per_doc = bfp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fps"))
    known = (
        bfp.join(index.fingerprints.select("fp"), on="fp", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_known_fps"))
    )
    return (
        batch.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .join(known, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_fps", F.lit(0)).cast("long").alias("n_fps"),
            F.coalesce("n_known_fps", F.lit(0))
            .cast("long")
            .alias("n_known_fps"),
            F.round(
                F.coalesce("n_known_fps", F.lit(0))
                / F.greatest(F.coalesce("n_fps", F.lit(0)), F.lit(1)),
                6,
            ).alias("known_fraction"),
        )
    )


def duplicate_spans_between(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    k: int = 20,
    winnow_w: int | None = None,
) -> DataFrame:
    """Bipartite duplicated spans: maximal character ranges of ``df``
    docs that appear verbatim ANYWHERE in ``reference`` — the
    span-level benchmark-decontamination primitive. E32 drops a whole
    document when it overlaps a benchmark; this locates the exact
    contaminated ranges so :func:`scrub_spans_between` can cut only
    them — the modern practice (surgical decontamination keeps the
    99% of a long doc that isn't the quoted benchmark item).

    Same two tiers as :func:`duplicate_spans`: exact (string-keyed
    k-grams, oracle-parity) and winnowed (``winnow_w=w``; the
    >= w+k-1 detection guarantee applies — content-defined selection
    picks identical fingerprints in both corpora at any alignment).
    Only the reference's DISTINCT gram/fingerprint set joins (a
    benchmark is small: broadcast-eligible, Catalyst/AQE decides);
    the corpus never self-joins.

    Output: ``id_col``, ``span_start``, ``span_end``, ``span_len``
    for ``df`` rows only.
    """
    ref_text = ref_text_col or text_col
    if winnow_w is None:
        grams = kgram_positions(df, text_col, id_col, k)
        ref_keys = kgram_positions(
            reference.select(F.col(ref_text).alias("__rt")),
            "__rt",
            "__rt",  # id unused; gram set is all we keep
            k,
        ).select("gram").distinct()
        key, merge_gap = "gram", k
    else:
        grams = winnow_fingerprints(df, text_col, id_col, k, winnow_w)
        ref_keys = winnow_fingerprints(
            reference.select(F.col(ref_text).alias("__rt")),
            "__rt",
            "__rt",
            k,
            winnow_w,
        ).select("fp").distinct()
        key, merge_gap = "fp", k + winnow_w - 1
    hits = grams.join(ref_keys, on=key, how="left_semi").select(
        id_col, "pos"
    )
    return _merge_islands(hits, id_col, k, merge_gap)


def scrub_spans_between(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    k: int = 20,
    winnow_w: int | None = None,
    out_col: str = "text_clean",
) -> DataFrame:
    """Surgical benchmark decontamination: cut every span shared with
    ``reference`` out of every ``df`` doc and stitch the remainder
    (all input rows survive; untouched docs pass through verbatim,
    including NULL). Same doc-local span-list fold as
    :func:`remove_duplicate_spans` (see :func:`_cut_spans`)."""
    spans = duplicate_spans_between(
        df, reference, text_col, id_col, ref_text_col, k, winnow_w
    )
    return _cut_spans(df, spans, text_col, id_col, out_col)
