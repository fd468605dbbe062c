"""Acoustic fingerprint + banded audio near-dup
(operators/audiohash.py). All-real path: s16le PCM needs no codec, so
every test here exercises actual signal math."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from mysql_syncer_spark.operators.audiohash import (
    FRAMES,
    audio_fingerprint,
    audio_near_dup_pairs,
    fingerprint_pcm,
)

SR = 16000


def _pcm(freq=440.0, seconds=1.0, amp=12000, envelope=True, noise=0):
    """Deterministic sine clip; optional linear fade-in envelope gives
    the energy contour a monotone trend, optional integer 'noise'
    perturbs samples without moving frame energies much."""
    n = int(SR * seconds)
    out = bytearray()
    for i in range(n):
        a = amp * (i / n) if envelope else amp
        v = int(a * math.sin(2 * math.pi * freq * i / SR))
        if noise:
            v += ((i * 2654435761) % (2 * noise + 1)) - noise
        v = max(-32768, min(32767, v))
        out += struct.pack("<h", v)
    return bytes(out)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_locality():
    base, _ = fingerprint_pcm(_pcm())
    same, _ = fingerprint_pcm(_pcm())
    noisy, _ = fingerprint_pcm(_pcm(noise=50))
    loud_end, _ = fingerprint_pcm(_pcm(envelope=False))
    assert _ham(base, same) == 0
    # tiny additive noise barely moves frame energies
    assert _ham(base, noisy) <= 3
    # flat envelope vs rising envelope: contour flips broadly
    assert _ham(base, loud_end) > 10


def test_fingerprint_edges():
    sig0, n0 = fingerprint_pcm(b"")
    assert (sig0, n0) == (0, 0)
    # odd trailing byte ignored
    siga, na = fingerprint_pcm(b"\x01\x02\x03")
    sigb, nb = fingerprint_pcm(b"\x01\x02")
    assert (siga, na) == (sigb, 1)
    # shorter than FRAMES samples still deterministic
    s1, _ = fingerprint_pcm(b"\x00\x10" * 10)
    s2, _ = fingerprint_pcm(b"\x00\x10" * 10)
    assert s1 == s2


def test_audio_near_dup_pairs_banded_equals_brute(spark):
    rows = [
        (1, _pcm()),
        (2, _pcm()),                 # byte-identical
        (3, _pcm(noise=50)),         # near-dup
        (4, _pcm(envelope=False)),   # far
        (5, None),                   # no payload
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    fp = {r["media_id"]: r["afp"]
          for r in audio_fingerprint(df).collect() if r["afp"] is not None}
    assert fp[1] == fp[2]
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in audio_near_dup_pairs(df, max_bits=3).collect()}
    ids = sorted(fp)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = _ham(fp[a], fp[b])
            if d <= 3:
                brute[(a, b)] = d
    assert got == brute
    assert got[(1, 2)] == 0
    assert (1, 3) in got and (2, 3) in got
    assert not any(4 in p or 5 in p for p in got)


def test_n_samples_matches_bytes(spark):
    df = spark.createDataFrame(
        [(1, _pcm(seconds=0.5))], "media_id long, media binary"
    )
    row = audio_fingerprint(df).collect()[0]
    assert row["n_samples"] == SR // 2


def test_frames_constant():
    assert FRAMES - 1 == 64  # one LongType signature width
