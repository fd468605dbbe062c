"""Byte-pair-encoding tokenizer: distributed training + Arrow encode.

The missing piece between the engine's regex token *counting*
(operators/text.py BPE_REGEX) and a real subword tokenizer: train the
merge table on the corpus itself, then encode with it. Training a BPE
vocab over a web-scale corpus is a genuinely distributed job — and it
has the classic trainer shape (same trick HuggingFace tokenizers use):

* all iterations run on the DISTINCT-WORD table ``(word, freq)``, not
  the corpus — one corpus-sized combinable shuffle up front, then
  every merge iteration touches only vocab-sized data (Zipf:
  vocab ≪ corpus);
* each iteration: explode adjacent symbol pairs weighted by word freq
  → one combinable pair-count shuffle → 1-row argmax collect (the only
  driver interaction, k rows total for k merges) → apply the merge to
  the symbol arrays with a pure-codegen ``aggregate`` fold (greedy
  left-to-right, exactly the sequential semantics);
* lineage is cut every few iterations with ``localCheckpoint`` — an
  iterative DataFrame loop otherwise compounds plan depth until
  planning time dwarfs execution.

Encoding applies the ordered merge list per word — an inherently
sequential inner loop, so it runs as an Arrow ``mapInPandas`` stage
(per-batch Python, never per-row) with the merge table broadcast via
closure capture; word-level LRU caching inside the batch exploits
Zipf again (most tokens belong to few distinct words).

No SQL oracle exists (iterative argmax training is not expressible in
one query); correctness is pytest-gated against an independent pure-
Python reference trainer/encoder, plus invariants (greedy overlap
handling, determinism under repartition, round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from mysql_syncer_spark.pin import pin

#: end-of-word marker appended to every word's last symbol, the
#: standard Sennrich et al. 2016 convention (lets the tokenizer learn
#: word-final units like "ing</w>")
EOW = "</w>"

#: cut lineage every N merge iterations
_CHECKPOINT_EVERY = 8


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    from mysql_syncer_spark.operators.text import normalized_text

    return (
        df.select(
            F.explode(
                F.split(normalized_text(text_col), " ")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols() -> F.Column:
    """word -> array of single-char symbols with EOW glued to the last."""
    # split(word, '') can emit a trailing '' depending on engine/regex
    # semantics — filter it so the EOW glue always lands on a real char
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, F.greatest(n - 1, F.lit(0))),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, count) for adjacent symbol pairs, weighted by word freq."""
    s = F.col("symbols")
    n = F.size(s)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(s, 1, n - 1),
            F.slice(s, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(symbols: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — a
    pure-codegen fold; overlapping runs merge like sequential BPE
    ('a a a' with merge (a,a) -> ['aa', 'a'])."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list (ties broken deterministically by (a, b) so the
    result is partitioning/engine-stable). Stops early when no pair
    reaches ``min_freq``."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words = _word_counts(df, text_col).select(
        _initial_symbols().alias("symbols"), "freq"
    )
    words = words.transform(pin)
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(words)
            .where(F.col("n") >= min_freq)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            _apply_merge(F.col("symbols"), a, b).alias("symbols"), "freq"
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            words = words.transform(pin)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode: repeatedly merge the best-ranked adjacent
    pair (training order = priority), greedy left-to-right within a
    rank."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        _, i = best
        a, b = syms[i], syms[i + 1]
        out = []
        j = 0
        while j < len(syms):
            if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``tokens_col`` (array<string>) and ``n_bpe_tokens`` — the
    doc's subword sequence under the trained merge table. Arrow
    ``mapInPandas`` with an intra-batch word cache (Zipf: most words
    repeat); NULL text encodes to an empty array."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                  for f in df.schema.fields)
        + f", `{tokens_col}` array<string>, `n_bpe_tokens` bigint"
    )

    def run(batches):
        import re as _re

        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            toks: list[str] = []
            norm = _re.sub(r"\s+", " ", text.strip().lower())
            for w in norm.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            encoded = pdf[text_col].map(enc)
            pdf = pdf.copy()
            pdf[tokens_col] = encoded
            pdf["n_bpe_tokens"] = encoded.map(len).astype("int64")
            yield pdf

    return df.mapInPandas(run, out_schema)
