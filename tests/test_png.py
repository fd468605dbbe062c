"""Pure-stdlib PNG codec: round-trips, all five scanline filters,
palette expansion, resize/gray kernels, error gating. No Spark, no
image library — this is the tier that makes the real pixel path
executable in this container."""

import random
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_syncer_spark.operators.png import (
    PNG_MAGIC,
    is_png,
    png_decode,
    png_encode,
    resize_nearest,
    to_gray,
)


def _gradient(w, h, ch):
    """Deterministic test image: every byte a distinct-ish function of
    position and channel."""
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("mode", ["L", "LA", "RGB", "RGBA"])
def test_roundtrip_all_modes(mode):
    w, h = 9, 5  # odd width: catches stride bugs
    px = _gradient(w, h, len(mode))
    data = png_encode(w, h, mode, px)
    assert is_png(data)
    assert png_decode(data) == (w, h, mode, px)


def _filter_line(f, line, prev, ch):
    """Forward PNG filter (the encoder side the module deliberately
    doesn't implement beyond type 0) — independent math cross-checking
    the decoder's unfilter."""
    out = bytearray()
    for i in range(len(line)):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((line[i] - pred) & 255)
    return out


def _chunk(ctype, payload):
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_unfilter_each_type(f):
    """Hand-assemble a PNG whose every scanline uses filter ``f``;
    decode must recover the raw pixels exactly."""
    w, h, mode = 6, 4, "RGB"
    ch = len(mode)
    px = _gradient(w, h, ch)
    stride = w * ch
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        raw.append(f)
        raw += _filter_line(f, line, prev, ch)
        prev = bytearray(line)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert png_decode(data) == (w, h, mode, px)


def test_palette_expansion():
    w, h = 4, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 1, 2, 1, 2, 2, 0, 0])
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += idx[y * w : (y + 1) * w]
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got = png_decode(data)
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert got == (w, h, "RGB", expect)


def test_resize_nearest_known():
    # 2x2 RGB quadrants upscaled 2x: each source pixel becomes a 2x2 block
    px = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 50, 60])
    out = resize_nearest(2, 2, "RGB", px, 4, 4)
    assert out[0:3] == out[3:6] == bytes([10, 0, 0])
    assert out[6:9] == out[9:12] == bytes([0, 20, 0])
    assert out[36:39] == bytes([0, 0, 30]) and out[42:45] == bytes([40, 50, 60])
    # downscale to 1x1 picks the top-left source pixel (floor rule)
    assert resize_nearest(2, 2, "RGB", px, 1, 1) == bytes([10, 0, 0])


def test_to_gray_known():
    assert to_gray("RGB", bytes([255, 0, 0])) == bytes([76])  # 299*255//1000
    assert to_gray("RGBA", bytes([0, 255, 0, 9])) == bytes([149])
    assert to_gray("L", bytes([7, 8])) == bytes([7, 8])
    assert to_gray("LA", bytes([7, 200, 8, 100])) == bytes([7, 8])


def test_error_gating():
    with pytest.raises(ValueError, match="magic"):
        png_decode(b"JFIF not a png at all")
    # 16-bit depth is out of scope and must refuse loudly
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        png_decode(data)
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(PNG_MAGIC + _chunk(b"IEND", b""))


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    mode=st.sampled_from(["L", "LA", "RGB", "RGBA"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_random(w, h, mode, seed):
    """encode∘decode is the identity for arbitrary pixel buffers in
    every supported mode and dimension (incl. 1-pixel edges)."""
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * len(mode)))
    assert png_decode(png_encode(w, h, mode, px)) == (w, h, mode, px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 10), h=st.integers(1, 10),
    tw=st.integers(1, 16), th=st.integers(1, 16),
    seed=st.integers(0, 2**32 - 1),
)
def test_resize_preserves_palette_of_values(w, h, tw, th, seed):
    """Nearest-neighbor output contains only source pixel values and
    has exactly the target geometry."""
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    out = resize_nearest(w, h, "L", px, tw, th)
    assert len(out) == tw * th
    assert set(out) <= set(px)
