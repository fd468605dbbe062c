"""Acoustic fingerprinting + near-duplicate audio pairs.

Closes the media leg of the dedup matrix alongside text
(MinHash/SimHash), embeddings (cosine/SemDeDup) and images (dHash,
operators/imagehash.py): raw PCM is reduced to a 64-bit energy-contour
fingerprint — the payload is split into 65 equal time frames, each
frame's INTEGER energy (sum of squared s16le samples — exact
arithmetic, no float drift across platforms) is compared to its
neighbor, one bit per adjacent-frame comparison. Same family as
Chromaprint/Shazam-style contour hashing, reduced to the
deterministic integer core; perceptually-similar clips (same signal,
small noise) keep most comparisons, so near-dup mining is again the
SimHash problem and reuses the pigeonhole-banded pair join
(`dedup.simhash_pairs_from_signatures`).

Unlike images there is NO codec tier: s16le PCM is directly
interpretable bytes (the same stand-in convention
`multimodal.extract_audio_features` uses), so the whole path is real
math in this container — no fake, no stub.

Spark shape: one Arrow `mapInPandas` pass (numpy reduceat per batch,
never per-sample Python), 8-byte signatures into the banded join; at
100 TB the audio bytes are read once and never shuffled.

Reference anchor: training-pipeline surface beyond the reference, same
charter as operators/multimodal.py / imagehash.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mysql_syncer_spark.operators.dedup import simhash_pairs_from_signatures

#: number of energy frames; FRAMES-1 = 64 adjacent comparisons = one
#: LongType signature, matching the SimHash banding width.
FRAMES = 65


def fingerprint_pcm(data: bytes) -> tuple[int, int]:
    """(signature, n_samples) for one s16le mono payload.

    Frame k spans samples [k*n//FRAMES, (k+1)*n//FRAMES); bit k is set
    iff frame k+1 has strictly higher energy than frame k. A trailing
    odd byte is ignored (not a whole sample). Payloads shorter than
    FRAMES samples yield empty frames with energy 0 — still
    deterministic, still comparable.
    """
    import numpy as np

    n = len(data) // 2
    samples = np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)
    bounds = [(k * n) // FRAMES for k in range(FRAMES)]
    sq = samples * samples
    if n:
        energies = np.add.reduceat(sq, bounds)
        # reduceat quirk: a repeated index (empty frame) returns the
        # single element at that index, not 0 — zero those out
        widths = np.diff(bounds + [n])
        energies = np.where(widths > 0, energies, 0)
    else:
        energies = np.zeros(FRAMES, dtype=np.int64)
    sig = 0
    for k in range(FRAMES - 1):
        if energies[k + 1] > energies[k]:
            sig |= 1 << k
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig, n


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """One 64-bit energy-contour fingerprint per clip:
    (id, afp, n_samples). NULL payloads pass through with NULLs."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("afp", LongType(), True),
            StructField("n_samples", IntegerType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = {id_col: batch[id_col], "afp": [], "n_samples": []}
            for data in batch[media_col]:
                if data is None:
                    out["afp"].append(None)
                    out["n_samples"].append(None)
                    continue
                sig, n = fingerprint_pcm(bytes(data))
                out["afp"].append(sig)
                out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema)


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    max_bits: int = 3,
) -> DataFrame:
    """Clip pairs within ``max_bits`` Hamming distance of the energy
    contour: (id_a, id_b, hamming), id_a < id_b — the SimHash banded
    join over acoustic signatures. NULL payloads never pair."""
    sig = audio_fingerprint(df, id_col, media_col).where(
        F.col("afp").isNotNull()
    )
    return simhash_pairs_from_signatures(
        sig, id_col, "afp", bits=64, max_bits=max_bits
    )
