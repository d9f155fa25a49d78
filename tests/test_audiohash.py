"""Self-validation for the perceptual audio fingerprint
(operators/audiohash.py): pure-Python hash properties (gain
invariance on real encoded bytes, cross-clip separation, flip-variant
behavior) plus the Spark-side census invariants at sf0.001.
"""

from __future__ import annotations

import itertools

import numpy as np

from inverted_index_using_the_map_reduce_paradigm_spark.operators.audiohash import (
    AFP_SAMPLES,
    AFP_VARIANTS,
    _band_edges,
    afp64,
    afp_payload,
    afp_signal,
    decode_pcm,
    encode_pcm_wav,
)
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _hash_at_gain(aud: int, gain: float, flip_k: int = 0) -> int:
    return afp64(decode_pcm(encode_pcm_wav(afp_signal(aud, flip_k), gain)))


def test_gain_invariance_on_encoded_bytes():
    # the claim is about REAL 16-bit WAV bytes, not ideal floats:
    # quantization noise must not flip any adjacent-band comparison
    for aud in range(30):
        assert _hash_at_gain(aud, 0.8) == _hash_at_gain(aud, 0.4), aud
        assert _hash_at_gain(aud, 0.8) == _hash_at_gain(aud, 0.1), aud


def test_cross_clip_separation():
    hashes = [_hash_at_gain(i, 0.8) for i in range(40)]
    dmin = min(_ham(a, b) for a, b in itertools.combinations(hashes, 2))
    assert dmin > 10, dmin


def test_flip_variant_hamming_tracks_flips():
    # flipping k walk directions moves ~k adjacent-band comparisons
    # (reflections at the walk bounds can add a couple)
    seen = set()
    for aud in range(60):
        h = _ham(_hash_at_gain(aud, 0.8), _hash_at_gain(aud, 0.8, aud % 4))
        assert h <= (aud % 4) + 4, (aud, h)
        seen.add(h)
    assert 0 in seen and any(h > 0 for h in seen)


def test_band_edges_strictly_increasing_and_loud_on_short_clips():
    e = _band_edges(AFP_SAMPLES // 2 + 1)
    assert len(e) == 66
    assert (np.diff(e) >= 1).all()
    import pytest

    with pytest.raises(ValueError):
        _band_edges(40)  # shorter than the band count: refuse loudly


def test_payload_variants_decode_and_twin():
    p0, p1 = afp_payload(0), afp_payload(1)
    assert p0[:4] == b"RIFF" and p1[:4] == b"RIFF"
    assert p0 != p1  # byte-different (gain), fingerprint-identical
    assert afp64(decode_pcm(p0)) == afp64(decode_pcm(p1))


def test_census_invariants_and_dedup_consistency(spark):
    qs = load_all()
    row = qs["multimodal_audiohash_census"].fn(spark, SF).collect()[0]
    assert row.banding_lossless
    assert row.twins_found_h0
    assert row.n_gain_twin_pairs > 0
    pairs = qs["multimodal_audiohash_dedup"].fn(spark, SF).collect()
    assert len(pairs) >= row.n_gain_twin_pairs
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3
    twin = {
        (r.doc_a, r.doc_b): r.hamming
        for r in pairs
        if r.doc_b == r.doc_a + 1 and r.doc_a % AFP_VARIANTS == 0
    }
    assert len(twin) == row.n_gain_twin_pairs
    assert set(twin.values()) == {0}
