"""Self-validation for the video near-dup operator
(operators/videohash.py): raw-AVI codec fidelity, frame-set Jaccard
properties, and the oracle-predicted pair structure at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pytest

from inverted_index_using_the_map_reduce_paradigm_spark.operators.phash import (
    phash64,
)
from inverted_index_using_the_map_reduce_paradigm_spark.operators.videohash import (
    N_FRAMES,
    VIDEO_VARIANTS,
    decode_avi_raw_frames,
    encode_avi_raw,
    video_payload,
)
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_avi_raw_roundtrip_is_exact():
    rasters = [
        (np.arange(64 * 48, dtype=np.int64).reshape(48, 64) * (i + 1) % 256)
        .astype(np.uint8)
        for i in range(3)
    ]
    back = decode_avi_raw_frames(encode_avi_raw(rasters))
    assert len(back) == 3
    for orig, dec in zip(rasters, back):
        assert np.array_equal(dec, orig.astype(np.float64)), "gray roundtrip"


def test_avi_decoder_rejects_non_avi_and_wrong_sizes():
    with pytest.raises(ValueError):
        decode_avi_raw_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # truncated frame chunk fails loud, not silently short
    good = encode_avi_raw([np.zeros((8, 8), dtype=np.uint8)])
    with pytest.raises(ValueError):
        decode_avi_raw_frames(good[:-40] + b"\x00" * 8)


def test_variant_structure_reorder_and_trim():
    p0 = decode_avi_raw_frames(video_payload(0))
    p1 = decode_avi_raw_frames(video_payload(1))
    p2 = decode_avi_raw_frames(video_payload(2))
    assert len(p0) == N_FRAMES and len(p2) == N_FRAMES - 1
    h0 = [phash64(f) for f in p0]
    h1 = [phash64(f) for f in p1]
    h2 = [phash64(f) for f in p2]
    assert h1 == h0[::-1]  # re-cut: same frames, reversed
    assert h2 == h0[:-1]  # trim: last frame dropped
    assert len(set(h0)) == N_FRAMES  # distinct frames hash distinctly


def test_cross_clip_frame_sets_disjoint():
    h = lambda d: {  # noqa: E731
        phash64(f) for f in decode_avi_raw_frames(video_payload(d))
    }
    # different vid groups share no frames (disjoint raster seeds)
    assert not (h(0) & h(3))
    assert not (h(0) & h(6))


def test_video_dedup_pairs_match_arithmetic(spark):
    qs = load_all()
    rows = qs["multimodal_video_dedup"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.doc_a // VIDEO_VARIANTS == r.doc_b // VIDEO_VARIANTS
        if r.doc_a % 3 == 0 and r.doc_b % 3 == 1:
            assert r.jaccard == 1.0
        else:
            assert r.jaccard == 0.875
