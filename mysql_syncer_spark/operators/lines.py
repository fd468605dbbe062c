"""Cross-document repeated-span removal (boilerplate scrub).

Web-scale pretraining corpora are polluted by boilerplate that repeats
VERBATIM across many documents — navigation chrome, cookie banners,
license footers, templated product blurbs. The C4 pipeline removed any
three-sentence span occurring more than once in the corpus; RefinedWeb
and Gopher scrub repeated lines the same way. This operator is that
stage generalized to token spans: the document is cut into consecutive
non-overlapping windows of ``span_tokens`` whitespace tokens, any span
whose corpus-wide DOCUMENT frequency reaches ``min_docs`` is deleted
from every document, and the survivors are stitched back in original
order.

Spark shape (all built-in codegen, no Python):

1. tokenize + ``explode(sequence(...))`` → one row per span (the only
   data-sized fan-out; spans tile the doc, so this restates the corpus
   ~1×, unlike shingling which restates it ~``span_tokens``×),
2. span document-frequency = two map-side-combinable shuffles
   (``distinct`` on (span, doc) then ``count`` per span),
3. the frequent-span blocklist is tiny by construction (boilerplate ≪
   corpus) → **broadcast** anti-join, the corpus-sized span stream never
   reshuffles for the filter,
4. reassembly = ONE shuffle on the doc id (``collect_list`` of
   (position, span) structs, sorted and rejoined — order restored
   explicitly, never assumed),
5. left join back to the input so empty docs and fully-scrubbed docs
   survive with ``''``.

At 100 TB the span strings themselves would be swapped for ``xxhash64``
keys in step 2 (the blocklist then carries hashes); the string form is
kept here for byte-exact DuckDB oracle parity, as in operators/text.py.

Reference anchor: extends the reference's row-hash diff idea
(Synchronizer.php:88-118 — hash rows, compare sets) from rows to
intra-document spans; everything else is training-pipeline surface
beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.text import ws_tokens


def _spans(df: DataFrame, text_col: str, id_col: str, span_tokens: int):
    """One row per non-overlapping ``span_tokens``-token window:
    (id, __g position, __span text). Empty docs produce no rows."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    nspans = F.floor((n + F.lit(span_tokens - 1)) / F.lit(span_tokens))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            nspans.cast("long").alias("__nspans"),
        )
        .where(F.col("__nspans") > 0)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("__nspans") - 1)
            ).alias("__g"),
            F.col("__toks"),
        )
        .select(
            id_col,
            "__g",
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    (F.col("__g") * span_tokens + 1).cast("int"),
                    span_tokens,
                ),
                " ",
            ).alias("__span"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    out_col: str = "text_clean",
) -> DataFrame:
    """Delete every ``span_tokens``-token span that occurs in at least
    ``min_docs`` DISTINCT documents, from ALL documents, and rebuild
    the text.

    Output: every input row (all original columns dropped except
    ``id_col``) with
    ``out_col``          — surviving spans rejoined with single spaces
                           (``''`` if the doc was empty or fully
                           scrubbed),
    ``n_spans``          — spans the doc was cut into,
    ``n_spans_removed``  — spans deleted as corpus-frequent.

    Deterministic and order/partitioning-independent: spans are
    positional, frequency is exact, reassembly sorts by position.
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    spans = _spans(df, text_col, id_col, span_tokens)

    # document frequency per span: distinct (span, doc) then count —
    # both shuffles are map-side combinable; the blocklist that falls
    # out is boilerplate-sized, so it broadcasts.
    frequent = (
        spans.select("__span", id_col)
        .distinct()
        .groupBy("__span")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__span")
    )

    kept = spans.join(F.broadcast(frequent), on="__span", how="left_anti")

    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__g", "__span"))
                ),
                lambda s: s["__span"],
            ),
            " ",
        ).alias("__txt"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_spans")
    )

    base = df.select(id_col)
    return (
        base.join(totals, on=id_col, how="left")
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("__txt", F.lit("")).alias(out_col),
            F.coalesce("__n_spans", F.lit(0)).cast("long").alias("n_spans"),
            (
                F.coalesce("__n_spans", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_spans_removed"),
        )
    )


def remove_repeated_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    stride: int = 4,
    min_docs: int = 2,
    out_col: str = "text_clean",
) -> DataFrame:
    """Overlapping-window boilerplate scrub — the shift-robust
    complement of :func:`remove_repeated_spans`.

    Tiled spans miss a duplicate that starts mid-span (the same
    boilerplate preceded by one extra word lands on different tile
    boundaries in different docs and never matches). Sliding windows of
    ``window_tokens`` tokens at every ``stride`` offset (stride <
    window = overlap) make a shifted copy agree on all fully-contained
    windows — the exact-substring-dedup insight (Lee et al. 2022),
    approximated at stride granularity so the corpus is restated
    ~window/stride times (window/stride = 2 by default, vs the suffix
    array's unbounded blowup).

    Removal semantics avoid interval merging entirely: a TOKEN is
    deleted iff ANY corpus-frequent window covers it. Flagged windows
    explode to covered (doc, position) pairs — only the flagged
    regions restate, boilerplate-sized — and survivors rebuild in
    original order. Docs shorter than ``window_tokens`` have no
    windows and pass through untouched.

    Output: ``id_col``, ``out_col``, ``n_tokens``,
    ``n_tokens_removed`` — every input row survives (fully-scrubbed
    docs keep ``''``).
    """
    if window_tokens < 1:
        raise ValueError(
            f"window_tokens must be >= 1, got {window_tokens}"
        )
    if not 1 <= stride <= window_tokens:
        raise ValueError(
            f"stride must be in [1, window_tokens], got {stride}"
        )
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    L, S = window_tokens, stride
    # NULL text behaves as empty (every input row survives to output)
    toks = F.coalesce(
        ws_tokens(text_col), F.array().cast("array<string>")
    )
    # base feeds FOUR consumers (the frequency pass, the flag pass, the
    # token rebuild and the final left join) — unpinned, the tokenize
    # scan re-executes once per consumer, serialized on the scan's task
    # count. pin_small spreads + materializes it below the scale gate;
    # at 100 TB it passes through and the recomputation is the
    # deliberate trade (see operators/spread.py).
    from mysql_syncer_spark.operators.spread import pin_small

    base = pin_small(
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.size(toks).cast("long").alias("__n"),
        )
    )
    # full windows only: starts 0, S, 2S, ..., floor((n-L)/S)*S
    spans = (
        base.where(F.col("__n") >= L)
        .select(
            id_col,
            "__toks",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.floor((F.col("__n") - L) / F.lit(S)).cast(
                            "long"
                        ),
                    ),
                    lambda i: i * S,
                )
            ).alias("__start"),
        )
        .select(
            id_col,
            "__start",
            F.array_join(
                F.slice(
                    F.col("__toks"), (F.col("__start") + 1).cast("int"), L
                ),
                " ",
            ).alias("__w"),
        )
    )
    frequent = (
        spans.select("__w", id_col)
        .distinct()
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("__w")
    )
    # flagged regions are boilerplate-sized: broadcast the blocklist
    flagged = spans.join(F.broadcast(frequent), on="__w", how="left_semi")
    # Rebuild INSIDE the row (r12): covered positions fold to one
    # set-valued column per flagged doc (collect_set dedups overlapping
    # windows; the frame is boilerplate-sized), and survivors are an
    # index-aware array filter over the already-tokenized text. The
    # previous shape posexploded EVERY token of EVERY doc into a
    # corpus-wide shuffle, anti-joined the covered (doc, pos) pairs and
    # re-assembled docs with a collect_list groupBy — restating the
    # whole corpus token-by-token across the wire to delete a
    # boilerplate-sized fraction of it (guide §2.3: shuffle the small
    # thing). Covered positions are always in [0, __n) (full windows
    # only), so n_tokens_removed is exactly the set size.
    cov = flagged.select(
        id_col,
        F.explode(
            F.sequence(F.col("__start"), F.col("__start") + (L - 1))
        ).alias("__pos"),
    ).groupBy(id_col).agg(F.collect_set("__pos").alias("__cov"))
    joined = base.join(cov, on=id_col, how="left")
    kept = F.when(F.col("__cov").isNull(), F.col("__toks")).otherwise(
        F.filter(
            "__toks",
            lambda _t, i: ~F.array_contains(
                F.col("__cov"), i.cast("long")
            ),
        )
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias(out_col),
        F.col("__n").alias("n_tokens"),
        F.coalesce(F.size("__cov"), F.lit(0))
        .cast("long")
        .alias("n_tokens_removed"),
    )
