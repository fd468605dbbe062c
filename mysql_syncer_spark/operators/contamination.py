"""Benchmark decontamination: flag/remove training documents that share
word n-grams with a held-out evaluation set.

The standard LLM-training-data hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): any training document containing an n-gram that also
occurs in an eval benchmark is contaminated and must be dropped (or have
the overlapping span redacted) before training.

Shape for 100 TB: the eval side is always tiny relative to the corpus
(benchmarks are at most millions of n-grams), so the eval n-gram set is
DISTINCT-ed and **broadcast** — the corpus side streams through a
broadcast-hash semi/inner join with ZERO shuffle of corpus data; the only
shuffle is the map-side-combinable per-doc overlap count. No operator in
the reference covers this (its diff model is whole-row equality,
TableConnection.php:46-51); this module generalizes "row seen elsewhere?"
to "span seen in the eval set?".

All expressions are built-in (split / transform / slice / explode —
whole-stage codegen); the word n-gram generator has an exact DuckDB
mirror via :func:`ngram_oracle_sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.text import normalized_text


def word_ngrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-grams per document: ``(id, gram)``.

    Tokens are whitespace splits of the normalized text (lowercase,
    collapsed whitespace) — identical to the fingerprint/langid
    tokenization. A document with fewer than ``n`` tokens yields no
    n-grams.
    """
    base = df.select(
        F.col(id_col), F.split(normalized_text(text_col), " ").alias("__tk")
    )
    # sequence(1, 0) would generate a DESCENDING [1, 0] — short docs must
    # take the typed-empty branch, not a degenerate sequence
    grams = F.expr(
        f"if(size(__tk) >= {n}, "
        f"array_distinct(transform(sequence(1, size(__tk) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__tk, i, {n})))), "
        f"cast(array() as array<string>))"
    )
    return base.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )


def contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document eval-set overlap: ``(id, n_overlap)`` for every
    corpus document sharing ≥1 word n-gram with ``eval_df`` (docs with
    zero overlap are absent — this is the flag list).

    ``n_overlap`` counts DISTINCT shared n-grams (both sides' n-gram
    sets are distinct per doc, and the eval side is globally
    distinct-ed, so the inner join emits each shared gram once per doc).
    The eval gram set is broadcast: corpus rows never shuffle for the
    join; the per-doc count shuffles only (id, partial-count) pairs.
    """
    eval_grams = (
        word_ngrams(eval_df, id_col, text_col, n)
        .select("gram")
        .distinct()
    )
    corpus_grams = word_ngrams(corpus, id_col, text_col, n)
    return (
        corpus_grams.join(F.broadcast(eval_grams), on="gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Corpus with contaminated documents removed: anti-join against the
    flag list (docs whose distinct-shared-n-gram count ≥ ``min_overlap``).
    The flag list is id+count only — broadcastable at any corpus size
    since it is bounded by (eval n-grams × docs containing them)."""
    flagged = contamination(corpus, eval_df, id_col, text_col, n).where(
        F.col("n_overlap") >= min_overlap
    )
    return corpus.join(
        F.broadcast(flagged.select(id_col)), on=id_col, how="left_anti"
    )


def ngram_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> str:
    """DuckDB CTE text producing exactly :func:`word_ngrams`'s rows
    (``(id, gram)``) — 1-based list slicing mirrors Spark's 1-based
    ``slice``; ``range(1, len-n+2)`` excludes the stop like Spark's
    sequence includes it, so both enumerate i = 1..len-n+1."""
    return (
        f"SELECT {id_col}, unnest(list_distinct(list_transform("
        f"range(1, greatest(len(tk) - {n - 2}, 1)), "
        f"i -> array_to_string(tk[i:i+{n - 1}], ' ')))) AS gram "
        f"FROM (SELECT {id_col}, string_split(regexp_replace(trim(lower("
        f"{text_col})), '\\s+', ' ', 'g'), ' ') AS tk FROM {table})"
    )
