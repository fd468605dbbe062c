"""Stdlib GIF codec + real frame-sampling stage."""

import pytest

from mysql_syncer_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_encode,
    gif_frames,
    gif_n_frames,
    is_gif,
)


def _solid(c, w, h):
    return bytes(c) * (w * h)


def test_lzw_round_trip_widths():
    import random

    rnd = random.Random(3)
    for ncolors, size in [(4, 50), (16, 500), (200, 5000)]:
        min_code = max(2, (ncolors - 1).bit_length())
        data = bytes(rnd.randrange(ncolors) for _ in range(size))
        assert _lzw_decode(min_code, _lzw_encode(min_code, data)) == data


def test_gif_round_trip_multiframe():
    w, h = 6, 5
    frames = [
        _solid((255, 0, 0), w, h),
        _solid((0, 255, 0), w, h),
        _solid((0, 0, 255), w, h),
    ]
    g = gif_encode(w, h, frames)
    assert is_gif(g)
    assert gif_n_frames(g) == 3
    W, H, out = gif_frames(g)
    assert (W, H) == (w, h)
    assert out == frames


def test_gif_disposal_and_transparency_composite():
    """Hand-built GIF: full red frame, then a 1x1 green partial frame
    with disposal 'leave' — frame 2 must composite green over red."""
    import struct

    from mysql_syncer_spark.operators.gif import _lzw_encode

    w = h = 2
    palette = b"\xff\x00\x00" + b"\x00\xff\x00"  # red, green
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0x80, 0, 0]) + palette
    def img(left, top, fw, fh, indices):
        blk = bytearray([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        blk += b"\x00" + bytes([2])
        lzw = _lzw_encode(2, bytes(indices))
        blk += bytes([len(lzw)]) + lzw + b"\x00"
        return blk
    out += img(0, 0, 2, 2, [0, 0, 0, 0])        # all red
    out += img(1, 1, 1, 1, [1])                 # green bottom-right
    out += b"\x3B"
    W, H, frames = gif_frames(bytes(out))
    assert frames[0] == b"\xff\x00\x00" * 4
    assert frames[1] == b"\xff\x00\x00" * 3 + b"\x00\xff\x00"


def test_gif_encoder_validation():
    with pytest.raises(ValueError):
        gif_encode(2, 2, [b"\x00" * 11])  # wrong frame size
    with pytest.raises(ValueError):
        gif_frames(b"NOTAGIF")


def test_spark_frame_sampling_real_path(spark):
    """End-to-end through mapInPandas: animated GIFs in a binary column
    → every-2nd composited frame as a REAL PNG + luma."""
    from pyspark.sql import functions as F

    from mysql_syncer_spark.operators.multimodal import sample_gif_frames
    from mysql_syncer_spark.operators.png import png_decode

    w, h = 5, 4
    frames = [
        _solid((0, 0, 0), w, h),
        _solid((255, 255, 255), w, h),
        _solid((255, 0, 0), w, h),
        _solid((0, 0, 255), w, h),
        _solid((0, 255, 0), w, h),
    ]
    gif = gif_encode(w, h, frames)
    rows = [(1, bytearray(gif)), (2, None), (3, bytearray(b"not media"))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = sample_gif_frames(df, every_k=2).collect()
    mine = sorted(
        (r for r in out if r["media_id"] == 1), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in mine] == [0, 2, 4]
    assert all(r["n_frames"] == 5 and r["width"] == w for r in mine)
    # frame 0 is black, frame 2 red: luma 0 and 76
    assert mine[0]["mean_luma"] == 0.0
    assert abs(mine[1]["mean_luma"] - 76.0) < 1.0
    # the emitted PNG decodes back to the exact composited frame
    pw, ph, mode, px = png_decode(bytes(mine[2]["frame_png"]))
    assert (pw, ph) == (w, h) and px == frames[4]
    # NULL media: no rows; non-GIF fake path: deterministic rows exist
    assert not [r for r in out if r["media_id"] == 2]
    fakes = [r for r in out if r["media_id"] == 3]
    assert fakes and all(r["frame_png"] is not None for r in fakes)
    # strict mode refuses non-GIF
    import pytest as _pytest

    strict = sample_gif_frames(
        df.where(F.col("media_id") == 3), fake_decode=False
    )
    with _pytest.raises(Exception):
        strict.collect()
