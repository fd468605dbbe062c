"""Multimodal plumbing: binary columns through mapInPandas, bytes-budget
repartitioning, frame sampling. Decode itself is a deterministic fake
(no image libs in the container) — the Spark-side contract is real."""

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.png import png_decode, png_encode
from mysql_syncer_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_audio_features,
    extract_image_features,
    frame_sample_plan,
    media_repartition,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    """Synthesize a binary media table from document text bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
    )


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_stub_gated():
    if not _has_pil():
        # non-PNG bytes with no image library must refuse loudly
        with pytest.raises(NotImplementedError):
            decode_image(b"xx", fake=False)
    w, h, f = decode_image(b"xx", fake=True)
    assert 64 <= w <= 255 and 64 <= h <= 255 and len(f) == FEATURE_DIM
    assert decode_image(b"xx", fake=True) == (w, h, f)  # deterministic


def _make_png(w, h):
    """A deterministic RGB gradient PNG via the stdlib encoder (also
    loadable by Pillow — png_encode writes spec-valid files)."""
    px = bytes(
        (x * 11 + y * 17 + c * 41) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return png_encode(w, h, "RGB", px)


def test_image_real_path(spark):
    """REAL pixel path, no skip: Pillow when installed, the stdlib PNG
    codec otherwise — decode reports true dimensions, features come
    from actual pixels, resize emits a decodable PNG at target size."""
    png = _make_png(10, 8)

    w, h, f = decode_image(png, fake=False)
    assert (w, h) == (10, 8) and len(f) == FEATURE_DIM
    assert all(-1.0 <= v < 1.0 for v in f)
    assert decode_image(png, fake=False) == (w, h, f)  # deterministic

    df = spark.createDataFrame([(1, png)], "media_id long, media binary")
    r = extract_image_features(df, fake_decode=False).collect()[0]
    assert (r["width"], r["height"]) == (10, 8)
    assert [round(v, 6) for v in r["features"]] == [round(v, 6) for v in f]
    out = resize_images(df, target=(4, 4), fake_resize=False).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    rw, rh, mode, _px = png_decode(bytes(out["media"]))
    assert (rw, rh, mode) == (4, 4, "RGB")


def test_image_real_path_mixed_with_nulls(spark):
    """Real decode through mapInPandas with NULLs interleaved — the
    batch loop must keep per-row NULL semantics on the real tier too."""
    rows = [(1, _make_png(6, 4)), (2, None), (3, _make_png(3, 3))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {
        r["media_id"]: r
        for r in extract_image_features(df, fake_decode=False).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert got[2]["width"] is None and got[2]["features"] is None
    assert (got[3]["width"], got[3]["height"]) == (3, 3)


def test_extract_image_features(spark, media):
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert len(r["features"]) == FEATURE_DIM
    assert len(r["sha256"]) == 64 and r["n_bytes"] > 0
    # schema contract: media bytes are gone
    assert "media" not in feats.columns
    # determinism across runs
    again = {x["media_id"]: x["sha256"] for x in extract_image_features(media).collect()}
    assert {x["media_id"]: x["sha256"] for x in rows} == again


def test_extract_handles_null_media(spark):
    """NULL media ⇒ NULL features (SQL semantics: sha256(NULL) IS NULL),
    not a silent featurization of b''."""
    df = spark.createDataFrame(
        [(1, None), (2, b"abc")], "media_id long, media binary"
    )
    rows = {r["media_id"]: r for r in extract_image_features(df).collect()}
    r1 = rows[1]
    assert (
        r1["n_bytes"] is None and r1["sha256"] is None
        and r1["width"] is None and r1["height"] is None
        and r1["features"] is None
    )
    assert rows[2]["n_bytes"] == 3 and len(rows[2]["sha256"]) == 64


def test_resize_images(spark, media):
    out = resize_images(media, target=(128, 96))
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows)
    # payload is content-dependent but size-bounded (digest + dims)
    assert all(len(r["media"]) == 36 for r in rows)
    # NULL passes through as NULL
    with_null = spark.createDataFrame(
        [(1, None)], "media_id long, media binary"
    )
    r = resize_images(with_null).collect()[0]
    assert r["media"] is None and r["width"] is None


def test_extract_audio_features(spark):
    import struct

    # 16000 samples of a constant amplitude-1000 "tone" = 1.0s at 16kHz
    pcm = struct.pack("<16000h", *([1000] * 16000))
    df = spark.createDataFrame(
        [(1, pcm), (2, b""), (3, None)], "media_id long, media binary"
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["duration_sec"] == 1.0
    assert abs(rows[1]["rms"] - 1000.0) < 1e-9
    assert rows[2]["duration_sec"] == 0.0 and rows[2]["rms"] == 0.0
    assert rows[3]["duration_sec"] is None and rows[3]["sha256"] is None


def test_audio_real_wav_path(spark):
    """fake_decode=False parses a real WAV container (stdlib wave):
    frame rate comes from the header, samples from the data chunk."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)  # header rate, NOT the 16k fake default
        wf.writeframes(struct.pack("<4000h", *([500] * 4000)))
    wav = buf.getvalue()

    df = spark.createDataFrame([(1, wav)], "media_id long, media binary")
    r = extract_audio_features(df, fake_decode=False).collect()[0]
    assert r["duration_sec"] == 0.5  # 4000 frames @ 8 kHz
    assert abs(r["rms"] - 500.0) < 1e-9
    assert r["n_bytes"] == len(wav)


def test_media_repartition_bytes_budget(spark, media):
    out = media_repartition(media, target_partition_bytes=50_000)
    total = media.select(F.sum(F.length("media"))).first()[0]
    expect = -(-total // 50_000)
    assert out.rdd.getNumPartitions() == expect


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 100), (2, 15), (3, 0)], "media_id long, n_frames int"
    )
    got = sorted(
        (r["media_id"], r["frame_idx"])
        for r in frame_sample_plan(vids, every_k=30).collect()
    )
    assert got == [(1, 0), (1, 30), (1, 60), (1, 90), (2, 0), (3, 0)]
