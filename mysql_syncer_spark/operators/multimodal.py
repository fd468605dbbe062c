"""Multimodal column plumbing: opaque binary media + typed metadata.

Contract for a 100 TB training-data pipeline: media (image/audio/video)
travels as an opaque ``binary`` column with a typed metadata struct; all
decode / feature-extract / resize / frame-sample work happens in
Arrow-batched Pandas iterators (``mapInPandas``) so bytes never
round-trip through Python row objects and executors stream batches
instead of materializing partitions.

The *decode* step is three-tiered: Pillow when importable (the at-scale
SIMD path), a pure-stdlib PNG codec otherwise (``operators/png.py`` —
zlib inflate + scanline unfilter; REAL pixels, runs in this container),
and a clearly-marked deterministic fake (``fake=True``) for non-PNG
formats with no library present. Schema contracts, batch iteration,
partition sizing, and UDF signatures are identical across tiers.

At scale:
* media bytes dominate partition size — ``media_repartition`` targets
  a bytes-per-partition budget instead of a row count, so a partition
  of 4 MB thumbnails and a partition of 40 MB videos both fit executor
  memory.
* feature extraction emits small fixed-width vectors; downstream joins/
  ANN run on those, never on the binary column (column pruning drops
  the bytes right after the map stage — verify with .explain:
  ReadSchema must not include 'media' in downstream stages).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_syncer_spark.operators import png as _png

#: schema of the feature-extraction output (media bytes dropped)
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _pil():
    """Import-guarded Pillow handle; None when the library is absent."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(data: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """Decode one image to (width, height, feature vector).

    Real-path tiers: Pillow when importable (any format), else the
    pure-stdlib PNG codec (this container's executable path). Features
    are a 4x4 grayscale thumbnail normalized to [-1, 1) — deterministic
    given the tier. ``fake=True`` selects a DETERMINISTIC FAKE that
    derives plausible values purely from the bytes (stable across runs
    and machines); ``fake=False`` on a non-PNG with no image library
    raises NotImplementedError.
    """
    if not fake:
        img_mod = _pil()
        if img_mod is not None:
            import io

            with img_mod.open(io.BytesIO(data)) as im:
                width, height = im.size
                thumb = im.convert("L").resize((4, 4))
                px = list(thumb.getdata())  # 16 values, 0..255
            return width, height, [(p - 128) / 128.0 for p in px]
        if _png.is_png(data):
            w, h, mode, pixels = _png.png_decode(data)
            px = _png.to_gray(mode, _png.resize_nearest(w, h, mode, pixels, 4, 4))
            return w, h, [(p - 128) / 128.0 for p in px]
        raise NotImplementedError(
            "decoding non-PNG images requires an image library (e.g. "
            "PIL) that is not available in this environment; pass "
            "fake=True for the deterministic fake decoder"
        )
    digest = hashlib.sha256(data).digest()
    width = 64 + digest[0] % 192          # 64..255
    height = 64 + digest[1] % 192
    features = [
        (digest[2 + i] - 128) / 128.0 for i in range(FEATURE_DIM)
    ]
    return width, height, features


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake_decode: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + featurize a binary image column via ``mapInPandas``.

    Arrow streams batches of (id, bytes) into Python; each batch emits
    (id, width, height, n_bytes, sha256, features) and DROPS the bytes,
    so only small rows flow to later stages. Real plumbing, stubbed
    pixel decode (see :func:`decode_image`).
    """
    id_name, media_name = id_col, media_col
    fake, dim = fake_decode, FEATURE_DIM
    # captured (not imported inside the closure): operators/png.py is
    # registered for cloudpickle BY-VALUE serialization, so these ship
    # with the closure and executors need neither mysql_syncer_spark
    # nor any image library on their path
    _is_png, _pdec = _png.is_png, _png.png_decode
    _prsz, _pgray = _png.resize_nearest, _png.to_gray

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # otherwise self-contained: module-level helpers would pickle BY
        # REFERENCE, requiring mysql_syncer_spark importable inside every
        # executor Python worker — not guaranteed (and the exact failure
        # seen when driving this from outside the repo). stdlib + locals
        # + the by-value png functions only.
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        try:
            from PIL import Image as _Img
        except ImportError:
            _Img = None

        def _decode(data: bytes):
            if not fake:
                if _Img is not None:
                    with _Img.open(_io.BytesIO(data)) as im:
                        w, h = im.size
                        px = list(im.convert("L").resize((4, 4)).getdata())
                    return w, h, [(p - 128) / 128.0 for p in px]
                if _is_png(data):
                    w, h, mode, pixels = _pdec(data)
                    px = _pgray(mode, _prsz(w, h, mode, pixels, 4, 4))
                    return w, h, [(p - 128) / 128.0 for p in px]
                raise NotImplementedError(
                    "decoding non-PNG images requires an image library "
                    "not present in this environment"
                )
            d = _hl.sha256(data).digest()
            return (
                64 + d[0] % 192,
                64 + d[1] % 192,
                [(d[2 + i] - 128) / 128.0 for i in range(dim)],
            )

        for pdf in batches:
            ids, widths, heights, sizes, hashes, feats = [], [], [], [], [], []
            for mid, data in zip(pdf[id_name], pdf[media_name]):
                ids.append(mid)
                if data is None:
                    # SQL semantics: NULL media ⇒ NULL features (the
                    # oracle's sha256(NULL)/octet_length(NULL) are NULL;
                    # featurizing b"" instead would silently diverge)
                    widths.append(None)
                    heights.append(None)
                    sizes.append(None)
                    hashes.append(None)
                    feats.append(None)
                    continue
                data = bytes(data)
                w, h, f = _decode(data)
                widths.append(w)
                heights.append(h)
                sizes.append(len(data))
                hashes.append(_hl.sha256(data).hexdigest())
                feats.append(f)
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "width": _pd.array(widths, dtype="Int32"),
                    "height": _pd.array(heights, dtype="Int32"),
                    "n_bytes": _pd.array(sizes, dtype="Int64"),
                    "sha256": hashes,
                    "features": feats,
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        featurize, IMAGE_FEATURES_SCHEMA
    )


#: schema of the resize stage: metadata + (possibly re-encoded) bytes
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    id_col: str = "media_id",
    media_col: str = "media",
    fake_resize: bool = True,
) -> DataFrame:
    """Resize a binary image column to ``target`` via ``mapInPandas``.

    Same contract as :func:`extract_image_features`: Arrow-batched
    bytes-in/bytes-out, NULL media passes through as NULL. Real-path
    tiers: Pillow (any format, kernel resample) else stdlib PNG
    (nearest-neighbor, PNG-out). ``fake_resize=True`` keeps the
    deterministic fake that emits a content-tagged placeholder payload
    for arbitrary non-image bytes.

    At scale this is the classic "normalize before training" stage: the
    output column is re-budgeted with :func:`media_repartition` because
    resizing changes the bytes-per-row distribution.
    """
    id_name, media_name = id_col, media_col
    tw, th = target
    fake = fake_resize
    _is_png, _pdec = _png.is_png, _png.png_decode
    _prsz, _penc = _png.resize_nearest, _png.png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        try:
            from PIL import Image as _Img
        except ImportError:
            _Img = None

        for pdf in batches:
            ids, widths, heights, blobs = [], [], [], []
            for mid, data in zip(pdf[id_name], pdf[media_name]):
                ids.append(mid)
                if data is None:
                    widths.append(None)
                    heights.append(None)
                    blobs.append(None)
                    continue
                if not fake:
                    data = bytes(data)
                    if _Img is not None:
                        with _Img.open(_io.BytesIO(data)) as im:
                            out = _io.BytesIO()
                            im.resize((tw, th)).save(out, format="PNG")
                        blobs.append(out.getvalue())
                    elif _is_png(data):
                        w, h, mode, pixels = _pdec(data)
                        blobs.append(
                            _penc(tw, th, mode, _prsz(w, h, mode, pixels, tw, th))
                        )
                    else:
                        raise NotImplementedError(
                            "resizing non-PNG images requires an image "
                            "library not present in this environment"
                        )
                    widths.append(tw)
                    heights.append(th)
                    continue
                data = bytes(data)
                # deterministic fake: payload = content digest + target
                # dims, so downstream stages see stable, size-bounded
                # bytes that still depend on the input content
                digest = _hl.sha256(data).digest()
                blobs.append(digest + tw.to_bytes(2, "big") + th.to_bytes(2, "big"))
                widths.append(tw)
                heights.append(th)
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "width": _pd.array(widths, dtype="Int32"),
                    "height": _pd.array(heights, dtype="Int32"),
                    "media": blobs,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, RESIZED_SCHEMA)


#: schema of the audio feature stage
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    sample_rate: int = 16_000,
    fake_decode: bool = True,
) -> DataFrame:
    """Audio twin of :func:`extract_image_features`: opaque bytes →
    (duration, RMS energy, digest) via ``mapInPandas``.

    ``fake_decode=True`` treats the payload as raw signed 16-bit
    little-endian PCM at ``sample_rate`` (headerless — a deterministic
    stand-in usable on arbitrary bytes). ``fake_decode=False`` parses a
    real WAV container with the stdlib ``wave`` module (16-bit PCM
    only), taking the frame rate from the header. Either way the sample
    math is vectorized numpy inside the Arrow batch. The int64
    square-sum is exact up to 2^33 samples per payload (s16le squares
    are ≤ 2^30); a payload can't exceed 2^30 samples through Spark
    anyway (BinaryType caps at 2 GB), but a guarded arbitrary-precision
    fallback keeps the exactness claim unconditional."""
    id_name, media_name = id_col, media_col
    sr, fake = sample_rate, fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def _rms(pcm: bytes) -> tuple[int, float]:
            # n samples + RMS over s16le PCM; exact int64 accumulation
            arr = _np.frombuffer(pcm[: (len(pcm) // 2) * 2], dtype="<i2")
            n = arr.size
            if n == 0:
                return 0, 0.0
            if n > (1 << 32):
                # int64 could wrap past 2^33 samples; unreachable via a
                # Spark row (2 GB binary = 2^30 samples) but kept so the
                # "exact" contract holds for any caller
                sq = sum(v * v for v in map(int, arr))
            else:
                sq = int((arr.astype(_np.int64) ** 2).sum())
            return n, (sq / n) ** 0.5

        for pdf in batches:
            ids, sizes, durs, rmss, hashes = [], [], [], [], []
            for mid, data in zip(pdf[id_name], pdf[media_name]):
                ids.append(mid)
                if data is None:
                    sizes.append(None)
                    durs.append(None)
                    rmss.append(None)
                    hashes.append(None)
                    continue
                data = bytes(data)
                if fake:
                    n, rms = _rms(data)
                    rate = sr
                else:
                    with _wave.open(_io.BytesIO(data), "rb") as wf:
                        if wf.getsampwidth() != 2:
                            raise NotImplementedError(
                                "only 16-bit PCM WAV is supported"
                            )
                        rate = wf.getframerate() * wf.getnchannels()
                        n, rms = _rms(wf.readframes(wf.getnframes()))
                sizes.append(len(data))
                durs.append(n / rate)
                rmss.append(rms)
                hashes.append(_hl.sha256(data).hexdigest())
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": _pd.array(sizes, dtype="Int64"),
                    "duration_sec": durs,
                    "rms": rmss,
                    "sha256": hashes,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def media_repartition(
    df: DataFrame,
    media_col: str = "media",
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Repartition a media table by a *bytes* budget, not a row count.

    One job computes total payload size; the repartition uses a round-
    robin shuffle into ceil(total/target) partitions. At 100 TB this is
    what keeps a mixed-size media table from OOMing executors — row
    counts say nothing about binary payload skew.
    """
    total = df.select(
        F.sum(F.coalesce(F.length(F.col(media_col)), F.lit(0))).alias("b")
    ).first()["b"] or 0
    n = max(1, int((total + target_partition_bytes - 1) // target_partition_bytes))
    return df.repartition(n)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    every_k: int = 30,
) -> DataFrame:
    """Video frame-sampling *plan*: explode (media_id, frame_idx) rows
    for every k-th frame — pure built-ins (sequence + explode); the
    actual frame extraction would consume this plan inside the same
    kind of mapInPandas stage as :func:`extract_image_features`."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                F.lit(every_k),
            )
        ).alias("frame_idx"),
    )


#: schema of the frame-sampling stage: one row per sampled frame
FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def sample_gif_frames(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "media_id",
    media_col: str = "media",
    fake_decode: bool = True,
) -> DataFrame:
    """REAL video-tier frame sampling: decode an animated-GIF column
    with the stdlib codec (operators/gif.py — LZW, palettes, disposal,
    transparency), keep every ``every_k``-th composited frame, and emit
    each as a real PNG (operators/png.py) plus its mean luma — the
    materialized form of :func:`frame_sample_plan`.

    Tiers, same contract as the image/audio stages: GIF payloads take
    the real codec path end-to-end; ``fake_decode=True`` lets arbitrary
    non-GIF bytes produce deterministic sha-derived placeholder frames
    (so the Spark plumbing is exercised on any fixture); NULL media
    yields no frames. At deployment the GIF branch swaps for a real
    video codec without touching this plumbing. Arrow-batched
    ``mapInPandas``; pair with :func:`media_repartition` first — frame
    fan-out multiplies bytes-per-row.
    """
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    id_name, media_name, fake = id_col, media_col, fake_decode
    from mysql_syncer_spark.operators.gif import gif_frames, is_gif
    from mysql_syncer_spark.operators.png import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def frames_of(data: bytes):
            if is_gif(data):
                w, h, frames = gif_frames(data)
                return w, h, frames
            if not fake:
                raise NotImplementedError(
                    "non-GIF frame extraction requires a video codec "
                    "not present in this environment"
                )
            d = _hl.sha256(data).digest()
            w, h = 4 + d[0] % 4, 4 + d[1] % 4
            n = 1 + d[2] % 6
            return w, h, [
                bytes([d[(3 + f + i) % 32] for i in range(3)]) * (w * h)
                for f in range(n)
            ]

        for pdf in batches:
            ids, idxs, ns, ws, hs, pngs, lumas = [], [], [], [], [], [], []
            for mid, data in zip(pdf[id_name], pdf[media_name]):
                if data is None:
                    continue
                w, h, frames = frames_of(bytes(data))
                n = len(frames)
                for fi in range(0, n, every_k):
                    rgb = frames[fi]
                    luma = sum(
                        (rgb[o] * 299 + rgb[o + 1] * 587 + rgb[o + 2] * 114)
                        // 1000
                        for o in range(0, len(rgb), 3)
                    ) / (w * h)
                    ids.append(mid)
                    idxs.append(fi)
                    ns.append(n)
                    ws.append(w)
                    hs.append(h)
                    pngs.append(png_encode(w, h, "RGB", rgb))
                    lumas.append(luma)
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": _pd.array(idxs, dtype="Int32"),
                    "n_frames": _pd.array(ns, dtype="Int32"),
                    "width": _pd.array(ws, dtype="Int32"),
                    "height": _pd.array(hs, dtype="Int32"),
                    "frame_png": pngs,
                    "mean_luma": lumas,
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        run, FRAME_SAMPLE_SCHEMA
    )
