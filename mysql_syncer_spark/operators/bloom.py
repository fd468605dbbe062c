"""Distributed Bloom filter on DataFrame primitives — the constant-
space membership pre-gate for exact dedup at ingest.

Why it exists: the exact-fingerprint ingest gate anti-joins every
incoming batch against the corpus fingerprint set (operators/dedup.
incremental_new_docs; reference economics: only differences get row
work, Synchronizer.php:204-225). That join is O(corpus) state per
batch unless the fp table is indexed. A Bloom filter compresses the
corpus fp set into a FIXED-SIZE bit array (1 MiB covers ~1 M entries
at ~2% FP with k=5): probing is corpus-size-independent, and a Bloom
"absent" is EXACT (no false negatives), so definitely-new docs skip
the join entirely — only the "maybe present" sliver pays it. At 100 TB
the bit array is a broadcast table, never driver state.

Spark 4's `bloom_filter_agg`/`might_contain` are internal-only (not in
the public FunctionRegistry), so the filter is built from public
primitives — and stays fully distributed in BOTH directions:

* build — k probe positions per value (`xxhash64(v, seed)` pmod m)
  exploded, folded with ONE map-side-combinable `bit_or` shuffle into
  ≤ m/64 ``(word_idx, bits)`` rows. No driver collect.
* probe — each value's k positions LEFT-JOIN the words table
  (words-sized ⇒ broadcast, plan-gated) and ``bool_and`` the bit
  tests: one narrow broadcast join, no UDF, no collect.

Deterministic: positions come from xxhash64 with fixed seeds, so the
same corpus always yields the same words table (persistable/appendable
like any DataFrame — union + re-aggregate folds a new batch in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default geometry: 2^23 bits = 1 MiB; with k=5 this holds ~1M entries
#: at roughly 2% false-positive rate ((1-e^{-kn/m})^k)
DEFAULT_NUM_BITS = 1 << 23
DEFAULT_NUM_HASHES = 5

_POS = "__bloom_pos"
_WORD = "__bloom_word"
_MASK = "__bloom_mask"


def _positions(col, num_bits: int, num_hashes: int):
    """Array of k bit positions for a value — xxhash64 with literal
    seeds, pmod m (never negative)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Build the filter: DataFrame(word_idx INT, bits LONG), at most
    ``num_bits/64`` rows. One combinable bit_or shuffle; NULL values
    contribute nothing (SQL semantics: NULL is never "present")."""
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = F.explode(_positions(F.col(col), num_bits, num_hashes)).alias(_POS)
    return (
        df.where(F.col(col).isNotNull())
        .select(pos)
        .select(
            (F.col(_POS) / 64).cast("int").alias("word_idx"),
            F.expr(f"shiftleft(1L, int({_POS} % 64))").alias(_MASK),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(_MASK).alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    bloom_words: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    flag: str = "might_contain",
) -> DataFrame:
    """Add boolean ``flag``: False ⇒ value is DEFINITELY not in the
    built set (Bloom filters have no false negatives); True ⇒ maybe.
    NULL values probe as False.

    Plan: k-explode + broadcast join on word_idx + bool_and — the
    words table is ≤ m/64 rows, always broadcastable.
    """
    probes = df.select(
        F.col(col).alias("__bloom_key"),
        F.posexplode_outer(
            _positions(F.col(col), num_bits, num_hashes)
        ).alias("__bloom_i", _POS),
    ).select(
        "__bloom_key",
        "__bloom_i",
        F.col(_POS),
        (F.col(_POS) / 64).cast("int").alias("word_idx"),
        F.expr(f"shiftleft(1L, int({_POS} % 64))").alias(_MASK),
    )
    hit = (
        probes.join(F.broadcast(bloom_words), on="word_idx", how="left")
        .withColumn(
            "__bloom_hit",
            F.coalesce(
                (F.col("bits").bitwiseAND(F.col(_MASK)) != 0)
                & F.col(_POS).isNotNull(),
                F.lit(False),
            ),
        )
        .groupBy("__bloom_key")
        .agg(F.bool_and("__bloom_hit").alias(flag))
    )
    return df.join(
        hit.withColumnRenamed("__bloom_key", col), on=col, how="left"
    ).withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))


def bloom_new_docs(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Exact-dedup ingest gate with a Bloom pre-filter: incoming docs
    whose normalized-text fingerprint is NOT in the corpus —
    output-identical to the plain fp anti-join (oracle-checked), but
    only the Bloom-"maybe" sliver ever joins the corpus fp set:

    * definitely-new (``might_contain = false``) — pass through with
      ZERO join work (the exactness of Bloom negatives);
    * maybe-present — exact broadcast/shuffle anti-join confirms; false
      positives (~2% at default geometry) survive via this join, so
      the composition is exact, not approximate.

    Per batch, the corpus contributes one fp projection to build the
    filter (amortizable: persist the words table and fold batches in
    with union + re-aggregate) and the exact join sees only
    |maybe| ≈ FP-rate × |batch| rows.
    """
    from mysql_syncer_spark.operators.text import normalized_text

    fp_col = F.md5(normalized_text(text_col))
    corpus_fp = corpus.select(fp_col.alias("__fp"))
    words = bloom_build(corpus_fp, "__fp", num_bits, num_hashes)
    inc = incoming.withColumn("__fp", fp_col)
    flagged = bloom_might_contain(
        inc, words, "__fp", num_bits, num_hashes, flag="__maybe"
    )
    definitely_new = flagged.where(~F.col("__maybe"))
    maybe = flagged.where(F.col("__maybe"))
    confirmed_new = maybe.join(
        corpus_fp.distinct(), maybe["__fp"] == corpus_fp["__fp"],
        "left_anti",
    )
    return (
        definitely_new.unionByName(confirmed_new)
        .drop("__maybe", "__fp")
    )
