"""Perceptual dHash + banded image near-dup (operators/imagehash.py).

The real decode path runs against PNGs built by the pure-stdlib codec
(operators/png.py), so these tests exercise actual pixel math in this
container — no Pillow required, no fake tier."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators import png
from mysql_syncer_spark.operators.imagehash import (
    GRID,
    dhash_bits,
    image_dhash,
    image_near_dup_pairs,
)

W, H = 36, 32  # multiples of the 9x8 grid so sampling is exact


def _gradient(perturb_at=None, delta=40):
    """Horizontal grayscale gradient; optionally brighten ONE sampled
    pixel (lands in exactly one dHash grid cell -> <=2 bits flip)."""
    px = bytearray()
    for y in range(H):
        for x in range(W):
            px.append((x * 255) // (W - 1))
    if perturb_at is not None:
        x, y = perturb_at
        i = y * W + x
        px[i] = min(255, px[i] + delta)
    return png.png_encode(W, H, "L", bytes(px))


def _inverted():
    px = bytes(255 - (x * 255) // (W - 1) for _ in range(H)
               for x in range(W))
    return png.png_encode(W, H, "L", px)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _gradient()),
        (2, _gradient()),                      # byte-identical to 1
        (3, _gradient(perturb_at=(8, 8))),     # one grid cell differs
        (4, _inverted()),                      # opposite: far away
        (5, None),                             # no payload
    ]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_dhash_deterministic_and_null(media):
    out = image_dhash(media, fake_decode=False)
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["dhash"] == got[2]["dhash"]
    assert got[1]["width"] == W and got[1]["height"] == H
    assert got[5]["dhash"] is None and got[5]["width"] is None


def test_dhash_locality(media):
    """Identical -> 0 bits; one-cell perturbation -> <=2 bits; inverted
    gradient -> far (every comparison flips except intra-plateau ties)."""
    out = {r["media_id"]: r["dhash"]
           for r in image_dhash(media, fake_decode=False).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(out[1], out[2]) == 0
    assert 0 < ham(out[1], out[3]) <= 2
    assert ham(out[1], out[4]) > 10


def test_near_dup_pairs_banded_equals_brute(media):
    pairs = image_near_dup_pairs(media, max_bits=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    # brute-force over the signatures must agree with the banded join
    sigs = {r["media_id"]: r["dhash"]
            for r in image_dhash(media).collect() if r["dhash"] is not None}
    ids = sorted(sigs)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                brute[(a, b)] = d
    assert got == brute
    assert (1, 2) in got and got[(1, 2)] == 0
    assert (1, 3) in got  # the perturbed near-dup is found
    assert not any(4 in p or 5 in p for p in got)


def test_fake_tier_equal_bytes_law(spark):
    """fake_decode: equal payloads hash equal, unequal payloads are
    far — the law the driver oracle leans on."""
    rows = [(1, b"same-bytes"), (2, b"same-bytes"), (3, b"other")]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r["media_id"]: r["dhash"]
           for r in image_dhash(df, fake_decode=True).collect()}
    assert out[1] == out[2]
    d = bin((out[1] ^ out[3]) & ((1 << 64) - 1)).count("1")
    assert d > 10


def test_non_png_without_library_raises(spark):
    import mysql_syncer_spark.operators.multimodal as mm

    if mm._pil() is not None:
        pytest.skip("Pillow present: every byte string decodes")
    df = spark.createDataFrame(
        [(1, b"not an image")], "media_id long, media binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        image_dhash(df, fake_decode=False).collect()


def test_grid_constant_matches_bits():
    # 8x(8+1) grid -> exactly 64 comparison bits, the LongType width
    grid = bytes(range(GRID * (GRID + 1)))
    assert isinstance(dhash_bits(grid), int)
