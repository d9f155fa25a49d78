"""Self-validation for the perceptual image hash (operators/phash.py):
pure-Python hash properties (codec invariance, brightness invariance,
cross-image separation, noise behavior) plus the Spark-side census
invariants at sf0.001.
"""

from __future__ import annotations

import itertools

import numpy as np

from inverted_index_using_the_map_reduce_paradigm_spark.operators.phash import (
    HASH_SIDE,
    PHASH_VARIANTS,
    _area_resize,
    decode_gray,
    encode_gray_png,
    encode_gray_ppm,
    phash64,
    phash_payload,
    phash_raster,
)
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_codec_invariance_ppm_vs_png():
    # pixel-identical images must hash identically regardless of codec
    for img in range(25):
        r = phash_raster(img)
        h_ppm = phash64(decode_gray(encode_gray_ppm(r)))
        h_png = phash64(decode_gray(encode_gray_png(r)))
        assert h_ppm == h_png, img


def test_brightness_shift_invariance():
    # a global brightness shift moves only the DC coefficient, which is
    # excluded from the median — the hash must not change
    for img in range(10):
        r = phash_raster(img).astype(np.int64)
        shifted = np.clip(r + 10, 0, 255).astype(np.uint8)
        if (r + 10 > 255).any():
            continue  # clipping would be a real (non-uniform) change
        assert phash64(r) == phash64(shifted), img


def test_cross_image_separation():
    hashes = [phash64(phash_raster(i)) for i in range(40)]
    dmin = min(
        _ham(a, b) for a, b in itertools.combinations(hashes, 2)
    )
    # distinct random rasters sit far apart — nowhere near the <=3 band
    assert dmin > 10, dmin


def test_noise_variant_hamming_even_and_bounded():
    # the median threshold fixes popcount at 31/63 non-DC bits, so
    # perturbations flip bits in pairs (even hamming); spread stays
    # small because only 3 coarse cells move
    seen = set()
    for img in range(60):
        base = phash64(phash_raster(img))
        noisy = phash64(phash_raster(img, delta=img % 5))
        h = _ham(base, noisy)
        assert h % 2 == 0, (img, h)
        assert h <= 12, (img, h)
        seen.add(h)
    assert 0 in seen and any(h > 0 for h in seen), seen


def test_payload_variant_layout():
    # variant 0/2 are P6 PPMs, variant 1 a PNG; twins decode identical
    p0, p1, p2 = (phash_payload(d) for d in range(3))
    assert p0[:2] == b"P6" and p2[:2] == b"P6"
    assert p1[:4] == b"\x89PNG"[:4]
    assert np.array_equal(decode_gray(p0), decode_gray(p1))


def test_area_resize_exact_on_constant_and_small_inputs():
    assert np.allclose(_area_resize(np.full((64, 64), 7.0)), 7.0)
    # smaller-than-target inputs take the kron upsample path
    out = _area_resize(np.full((5, 3), 2.0))
    assert out.shape == (HASH_SIDE, HASH_SIDE)
    assert np.allclose(out, 2.0)


def test_census_invariants_and_dedup_consistency(spark):
    qs = load_all()
    row = qs["multimodal_phash_census"].fn(spark, SF).collect()[0]
    assert row.banding_lossless
    assert row.twins_found_h0
    assert row.n_raster_twin_pairs > 0
    # every emitted pair respects the threshold and ordering
    pairs = qs["multimodal_phash_dedup"].fn(spark, SF).collect()
    assert len(pairs) >= row.n_raster_twin_pairs
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3
    # the PPM/PNG twins (consecutive ids, a % 3 == 0) all at hamming 0
    twin = {
        (r.doc_a, r.doc_b): r.hamming
        for r in pairs
        if r.doc_b == r.doc_a + 1 and r.doc_a % PHASH_VARIANTS == 0
    }
    assert len(twin) == row.n_raster_twin_pairs
    assert set(twin.values()) == {0}


def test_incremental_equals_full_restricted_to_delta(spark):
    """The CDC equivalence: delta-banded pairs == full-corpus banding
    restricted to pairs touching the delta (same pairs, same hamming),
    plus the census flags on the driver surface."""
    qs = load_all()
    inc = {
        (r.doc_a, r.doc_b): r.hamming
        for r in qs["incremental_phash_dedup"].fn(spark, SF).collect()
    }
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.phash import (
        DELTA_PERIOD,
    )

    full = {
        (r.doc_a, r.doc_b): r.hamming
        for r in qs["multimodal_phash_dedup"].fn(spark, SF).collect()
        if r.doc_a % DELTA_PERIOD == 0 or r.doc_b % DELTA_PERIOD == 0
    }
    assert inc == full and len(inc) > 0
    row = qs["incremental_phash_census"].fn(spark, SF).collect()[0]
    assert row.incremental_equals_restricted_full
    assert row.twins_found_h0
    assert row.n_delta_twin_pairs > 0


def test_stream_phash_dedup_counts_image_groups(spark):
    """Streamed decode+pHash+dropDuplicates must collapse codec twins:
    keeper count == number of image groups among variants 0/1."""
    qs = load_all()
    got = qs["stream_phash_dedup"].fn(spark, SF).collect()[0][0]
    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    import pyspark.sql.functions as F

    docs = table(spark, SF, "documents").filter(F.col("doc_id") % 3 < 2)
    groups = docs.select(
        (F.col("doc_id") / 3).cast("long").alias("g")
    ).distinct().count()
    assert got == groups > 0
