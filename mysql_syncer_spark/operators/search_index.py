"""Persisted inverted index: exact term search over a document corpus
without scanning it.

The retrieval-side primitive next to the MinHash dedup index
(operators/minhash_index.py): posting lists ``(term, doc_id)`` built
ONCE from the corpus and persisted as a catalog table BUCKETED BY THE
TERM — a term lookup then reads only the term's bucket(s)
(``SelectedBucketsCount`` in the scan, gated in tests), never the
corpus and never the other buckets. AND-of-terms is the classic
posting-list intersection: filter the wanted terms, group by doc,
``HAVING count = n_terms`` — work proportional to the MATCHED posting
lists, independent of corpus size.

Same session-survival discipline as the MinHash index: the catalog
entry dies with the session but the files don't; ``_drop_stale`` +
re-register handles both directions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.minhash_index import (
    _drop_stale,
    _reattach_table,
)
from mysql_syncer_spark.operators.text import normalized_text, ws_tokens
from mysql_syncer_spark.sources.bucketed import write_bucketed


@dataclass(frozen=True)
class SearchIndex:
    name: str
    id_col: str
    postings: DataFrame


def postings_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct ``(term, id)`` pairs — normalized tokens, one combinable
    distinct shuffle keyed by the term."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(ws_tokens(normalized_text(text_col)))
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )


def search_index_write(
    corpus: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> SearchIndex:
    """Build + persist the posting table bucketed (and sorted) by term."""
    spark = corpus.sparkSession
    _drop_stale(spark, f"{name}_postings")
    write_bucketed(
        postings_frame(corpus, id_col, text_col),
        f"{name}_postings",
        ["term"],
        num_buckets,
        sort_cols=["term", id_col],
    )
    return search_index_read(spark, name, id_col)


def search_index_read(
    spark: SparkSession, name: str, id_col: str = "doc_id"
) -> SearchIndex:
    """Attach an index by name (re-registering the files in a fresh
    session if the in-memory catalog lost them)."""
    if not _reattach_table(spark, f"{name}_postings"):
        raise ValueError(f"no search index named {name!r}")
    return SearchIndex(name, id_col, spark.table(f"{name}_postings"))


def search(
    index: SearchIndex, terms: list[str], mode: str = "all"
) -> DataFrame:
    """Doc ids matching the terms: ``mode='all'`` intersects posting
    lists (every term present), ``'any'`` unions them. The IN filter on
    the bucket column prunes unread buckets at planning time."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be all/any, got {mode!r}")
    norm = sorted({t.strip().lower() for t in terms if t.strip()})
    hits = index.postings.where(F.col("term").isin(norm))
    if mode == "any":
        return hits.select(index.id_col).distinct()
    return (
        hits.groupBy(index.id_col)
        .agg(F.count_distinct("term").alias("__n"))
        .where(F.col("__n") == len(norm))
        .select(index.id_col)
    )
