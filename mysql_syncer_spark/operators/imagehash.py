"""Perceptual image hashing (dHash) + near-duplicate image pairs.

Completes the dedup matrix for the multimodal column family: text has
MinHash/SimHash (operators/dedup.py), embeddings have cosine/SemDeDup —
images get the classic difference hash. dHash downsamples the image to
a (grid+1) x grid grayscale grid and emits one bit per horizontally
adjacent pixel pair (right brighter than left); visually identical
images land within a few bits of Hamming distance, so near-dup mining
is EXACTLY the SimHash problem and reuses its pigeonhole-banded pair
join (`dedup.simhash_pairs_from_signatures`) — per-chunk equi-join,
never an all-pairs scan, AQE splits hot buckets.

Decode tiers mirror operators/multimodal.py: Pillow when importable,
else the pure-stdlib PNG codec (operators/png.py — the executable path
in this container), else a hard NotImplementedError unless
``fake_decode=True`` selects the DETERMINISTIC FAKE (grid bytes derived
from iterated SHA-256 of the payload). The fake keeps one real
guarantee — equal bytes <=> equal hash, unequal bytes land ~32 bits
apart — which is exactly what the oracle-backed driver query checks
(near-dup pairs == exact-duplicate payload pairs at Hamming 0).

Spark shape: hashing is one Arrow `mapInPandas` pass (bytes never
row-at-a-time Python), signatures are 8 bytes/image, and the pair join
runs on signatures only — at 100 TB the image bytes are read once and
never shuffled.

Reference anchor: the reference's dedup surface is row-hash equality
(Synchronizer.php:88-118); perceptual near-equality for media is
training-pipeline surface beyond it, same charter as
operators/multimodal.py.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mysql_syncer_spark.operators import png as _png
from mysql_syncer_spark.operators.dedup import simhash_pairs_from_signatures
from mysql_syncer_spark.operators.multimodal import _pil

#: dHash grid height (rows); width is GRID + 1 so each row yields GRID
#: adjacent-pair bits -> GRID*GRID = 64 bits total.
GRID = 8


def _fake_gray(data: bytes, n: int) -> bytes:
    """Deterministic pseudo-grayscale bytes: iterated SHA-256 of the
    payload. Equal payloads give equal grids; that is the only property
    the fake promises (and the only one the oracle leans on)."""
    out = b""
    block = hashlib.sha256(data).digest()
    while len(out) < n:
        out += block
        block = hashlib.sha256(block).digest()
    return out[:n]


def _gray_grid(data: bytes, fake: bool) -> tuple[int, int, bytes]:
    """(width, height, row-major (GRID+1) x GRID grayscale bytes)."""
    gw, gh = GRID + 1, GRID
    if not fake:
        img_mod = _pil()
        if img_mod is not None:
            import io

            with img_mod.open(io.BytesIO(data)) as im:
                w, h = im.size
                grid = bytes(im.convert("L").resize((gw, gh)).getdata())
            return w, h, grid
        if _png.is_png(data):
            w, h, mode, pixels = _png.png_decode(data)
            small = _png.resize_nearest(w, h, mode, pixels, gw, gh)
            return w, h, _png.to_gray(mode, small)
        raise NotImplementedError(
            "hashing non-PNG images requires an image library (e.g. "
            "PIL) that is not available in this environment; pass "
            "fake_decode=True for the deterministic fake"
        )
    digest = hashlib.sha256(data).digest()
    return (
        64 + digest[0] % 192,
        64 + digest[1] % 192,
        _fake_gray(data, gw * gh),
    )


def dhash_bits(grid: bytes) -> int:
    """Pack the 64 adjacent-pair comparisons into a SIGNED 64-bit int
    (Spark LongType two's complement, same convention as SimHash)."""
    gw = GRID + 1
    sig = 0
    bit = 0
    for r in range(GRID):
        row = grid[r * gw:(r + 1) * gw]
        for c in range(GRID):
            if row[c + 1] > row[c]:
                sig |= 1 << bit
            bit += 1
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake_decode: bool = False,
) -> DataFrame:
    """One 64-bit dHash per image: (id, dhash, width, height).

    NULL media rows pass through with NULL hash/dims (the "no payload"
    cohort — same convention as extract_image_features).
    """
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("dhash", LongType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = {id_col: batch[id_col], "dhash": [], "width": [],
                   "height": []}
            for data in batch[media_col]:
                if data is None:
                    out["dhash"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    continue
                w, h, grid = _gray_grid(bytes(data), fake_decode)
                out["dhash"].append(dhash_bits(grid))
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    max_bits: int = 3,
    fake_decode: bool = False,
) -> DataFrame:
    """Image pairs within ``max_bits`` Hamming distance of dHash:
    (id_a, id_b, hamming), id_a < id_b — the SimHash banded join over
    perceptual signatures. NULL-payload rows never pair."""
    sig = image_dhash(df, id_col, media_col, fake_decode).where(
        F.col("dhash").isNotNull()
    )
    return simhash_pairs_from_signatures(
        sig, id_col, "dhash", bits=64, max_bits=max_bits
    )


# ---------------------------------------------------------------------------
# Video near-dup: frame-level dHash inverted index
# ---------------------------------------------------------------------------

def _frame_grids(data: bytes, every_k: int, fake: bool):
    """Yield (frame_idx, (GRID+1)xGRID grayscale bytes) per sampled
    frame. Real tier: the stdlib GIF codec (lossless <=256-color
    round-trip, so equal frames give equal grids); fake tier:
    sha-derived pseudo-frames, count and content deterministic in the
    payload bytes."""
    from mysql_syncer_spark.operators import gif as _gif

    gw, gh = GRID + 1, GRID
    if _gif.is_gif(data):
        w, h, frames = _gif.gif_frames(data)
        for i in range(0, len(frames), every_k):
            small = _png.resize_nearest(w, h, "RGB", frames[i], gw, gh)
            yield i, _png.to_gray("RGB", small)
        return
    if not fake:
        raise NotImplementedError(
            "decoding non-GIF video requires a video codec that is not "
            "available in this environment; pass fake_decode=True for "
            "the deterministic fake"
        )
    digest = hashlib.sha256(data).digest()
    n_frames = 1 + digest[2] % 4
    for i in range(0, n_frames, every_k):
        yield i, _fake_gray(data + bytes([i]), gw * gh)


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    every_k: int = 1,
    fake_decode: bool = False,
) -> DataFrame:
    """One row per sampled frame: (id, frame_idx, dhash) — the
    shot-level signature table video dedup indexes on. NULL payloads
    yield no rows. Arrow `mapInPandas`; video bytes are read once,
    only 8-byte hashes flow on."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("frame_idx", IntegerType(), True),
            StructField("dhash", LongType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids, idxs, hashes = [], [], []
            for mid, data in zip(batch[id_col], batch[media_col]):
                if data is None:
                    continue
                for i, grid in _frame_grids(
                    bytes(data), every_k, fake_decode
                ):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(dhash_bits(grid))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "dhash": hashes}
            )

    return df.select(id_col, media_col).mapInPandas(run, schema)


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    min_shared: int = 2,
    every_k: int = 1,
    max_df: int = 100,
    fake_decode: bool = False,
) -> DataFrame:
    """Video pairs sharing >= ``min_shared`` perceptually-identical
    frames: (id_a, id_b, n_shared) — the classic shot-level video
    dedup. The join is an exact inverted index on the frame dHash
    (equi-join, shuffle key = 8-byte hash), NEVER pairwise over
    videos; ``max_df`` drops boilerplate frames seen in more than that
    many videos (solid black, station idents — the frame-level twin of
    the MinHash df-capped shingles: they carry no pairing signal and
    would otherwise square the hot bucket). Per-video frame hashes are
    deduped first so a looping GIF can't inflate n_shared."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    frames = (
        video_frame_hashes(df, id_col, media_col, every_k, fake_decode)
        .select(id_col, "dhash")
        .distinct()
    )
    rare = (
        frames.groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("dhash")
    )
    pruned = frames.join(rare, on="dhash", how="left_semi")
    a = pruned.select(F.col(id_col).alias("id_a"), "dhash")
    b = pruned.select(F.col(id_col).alias("id_b"), "dhash")
    return (
        a.join(b, on="dhash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
