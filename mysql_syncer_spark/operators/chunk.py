"""Document chunking: split long docs into fixed-size token windows.

Training and RAG pipelines never feed raw documents to a model — they
feed fixed-length windows (context-length chunks with overlap so no
span is split across a boundary without also appearing whole in a
neighbor). This is the complementary operator to sequence *packing*
(operators/packing.py): packing concatenates short docs up to the
budget; chunking splits long docs down to it.

Spark shape: tokenize (codegen ``split``), compute the chunk count with
integer arithmetic, ``explode(sequence(...))`` one row per window, and
``slice`` + ``array_join`` the window back to text. Everything is
row-local builtins — ZERO shuffle, embarrassingly parallel at 100 TB;
the only cost is the output fan-out, which is the answer's size.

Oracle form (DuckDB): ``generate_series`` per doc + 1-based inclusive
list slicing ``toks[a : b]`` mirrors Spark's 1-based
``slice(toks, start, length)`` exactly; both clamp at the array end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.text import ws_tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
    out_col: str = "chunk_text",
) -> DataFrame:
    """Explode each document into overlapping windows of
    ``chunk_tokens`` whitespace tokens, advancing ``stride`` tokens per
    window (overlap = chunk_tokens - stride).

    Window count is ``1 + ceil(max(0, n - chunk_tokens) / stride)`` —
    every doc yields at least one chunk (possibly shorter than
    ``chunk_tokens``; empty docs yield one empty chunk), and the last
    window always reaches the final token. Output columns: ``id_col``,
    ``chunk_id`` (0-based window index), ``out_col`` (the window,
    space-rejoined), ``n_chunk_tokens``.

    Deterministic and order-independent: windows are positional, no
    hashing involved. ``stride`` must be in (0, chunk_tokens].
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in (0, chunk_tokens], got {stride}"
        )
    toks = ws_tokens(text_col)
    n = F.size(toks)
    # ceil(max(0, n - chunk) / stride) in exact integer arithmetic —
    # float ceil would be engine-dependent on exact multiples
    over = F.greatest(F.lit(0), n - F.lit(chunk_tokens))
    n_chunks = F.lit(1) + F.floor(
        (over + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    window = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("__nc", n_chunks)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_id"
            ),
            F.col("__toks"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(window, " ").alias(out_col),
            F.size(window).alias("n_chunk_tokens"),
        )
    )
