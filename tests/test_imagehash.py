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


# ---------------------------------------------------------------------------
# video (frame-level) near-dup — REAL stdlib GIF codec path
# ---------------------------------------------------------------------------

def _frame(step):
    """W x H RGB: columns < step dark, >= step bright — distinct steps
    give dHash signatures ~16 bits apart, equal frames byte-equal."""
    dark, bright = (10, 10, 10), (240, 240, 240)
    px = bytearray()
    for y in range(H):
        for x in range(W):
            px += bytes(bright if x >= step else dark)
    return bytes(px)


def _gif(steps):
    from mysql_syncer_spark.operators.gif import gif_encode

    return gif_encode(W, H, [_frame(s) for s in steps])


@pytest.fixture(scope="module")
def videos(spark):
    rows = [
        (1, _gif([4, 12, 20])),    # shares frames 4,12 with video 2
        (2, _gif([4, 12, 28])),
        (3, _gif([8, 16])),        # shares only frame 8 with video 4
        (4, _gif([8, 24])),
        (5, None),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_video_frame_hashes_real_codec(videos):
    from mysql_syncer_spark.operators.imagehash import video_frame_hashes

    rows = video_frame_hashes(videos).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], {})[r["frame_idx"]] = r["dhash"]
    assert set(by_vid) == {1, 2, 3, 4}          # NULL payload: no rows
    assert len(by_vid[1]) == 3 and len(by_vid[3]) == 2
    # equal frames hash equal across videos; distinct steps differ
    assert by_vid[1][0] == by_vid[2][0]          # step 4
    assert by_vid[1][1] == by_vid[2][1]          # step 12
    assert by_vid[1][2] != by_vid[2][2]          # 20 vs 28
    assert by_vid[3][0] == by_vid[4][0]          # step 8


def test_video_near_dup_pairs(videos):
    from mysql_syncer_spark.operators.imagehash import video_near_dup_pairs

    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dup_pairs(videos, min_shared=2).collect()}
    assert got == {(1, 2): 2}
    # min_shared=1 also surfaces the single-frame overlap
    got1 = {(r["id_a"], r["id_b"]): r["n_shared"]
            for r in video_near_dup_pairs(videos, min_shared=1).collect()}
    assert got1 == {(1, 2): 2, (3, 4): 1}


def test_video_max_df_drops_boilerplate(spark):
    """A frame present in EVERY video (solid 'black') is pruned by the
    document-frequency cap and stops creating pairs on its own."""
    from mysql_syncer_spark.operators.imagehash import video_near_dup_pairs

    rows = [(i, _gif([0, 4 * i])) for i in range(1, 6)]  # step 0 common
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = video_near_dup_pairs(df, min_shared=1, max_df=3).collect()
    # the shared step-0 frame is in 5 > 3 videos -> pruned; unique
    # frames never pair
    assert got == []


def test_video_looping_gif_counts_once(spark):
    """Repeated identical frames inside ONE video dedupe before the
    join — a looping GIF can't inflate n_shared."""
    from mysql_syncer_spark.operators.imagehash import video_near_dup_pairs

    rows = [(1, _gif([4, 4, 4, 12])), (2, _gif([4, 12]))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dup_pairs(df, min_shared=1).collect()}
    assert got == {(1, 2): 2}
