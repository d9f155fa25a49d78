"""Perceptual image near-dup: DCT pHash over decoded rasters.

``multimodal_dedup`` (multimodal.py) is exact sha256 over payload
BYTES — re-encoded or lightly perturbed duplicate images sail through,
and that is the dominant duplicate class in crawled image corpora (the
same picture re-saved as PNG vs PPM, or with a few pixels of noise,
is byte-different but perceptually identical).  This module closes
that hole with the classic 64-bit pHash (Zauner 2010, "Implementation
and Benchmarking of Perceptual Image Hash Functions"; the pHash.org
algorithm): decode the payload to a grayscale raster, area-resize to
32x32, 2-D DCT-II, keep the 8x8 low-frequency corner, threshold each
coefficient against the median of the 63 non-DC coefficients -> 64
bits.  Pixel-identical images hash identically regardless of codec;
small perturbations move a few bits.

Candidate generation reuses ``dedup.hamming_band_pairs`` — the
SimHash 5-block combination banding (Manku et al., WWW'07) is
signature-agnostic, so the hamming<=3 join is EXACT by the same
pigeonhole and the 100 TB posture is the one already proven for
``simhash_dedup``: sub-quadratic banded candidates, bit_count verify,
16-byte signature rows that a production pipeline computes once at
ingest and stores beside the payload.

Fixture synthesis (deterministic, oracle-predictable structure):
every 3 consecutive doc_ids share one base raster (``img_id =
doc_id // 3``) — variant 0 encodes it as P6 PPM, variant 1 as a gray
PNG (pixel-identical, byte-different: the exact-dedup blind spot),
variant 2 perturbs one coarse cell by ``img_id % 5`` and encodes as
PPM (hamming spread 0..~4, so some pairs land at 1..3 and some drop
past the threshold — both paths exercised).  The (0,1) "raster twin"
pairs are pure doc_id arithmetic, so the census's DuckDB oracle
predicts their count in closed form while Spark proves each one was
FOUND at hamming 0 and that banding == brute force.

Reference parity note: the reference engine (main.c++) has no image
surface at all — this family is north-star extension surface
(SURVEY.md §2.3 "training-data pipeline ops").
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import materialize, table
from ..registry import register
from .dedup import (
    HAMMING_MAX,
    banding_census,
    combo_chunks,
    hamming_band_pairs,
    pack_bits64,
)
from .multimodal import _PNG_SIG, _png_chunk, _png_parse, _ppm_header

# pandas UDFs below run in Python workers; ship by value (house
# pattern, operators/multimodal.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

PHASH_VARIANTS = 3  # docs per shared base raster in the fixture
RASTER_SIDE = 64  # synthesized rasters are 64x64 gray
_COARSE = 8  # base rasters are an 8x8 coarse grid upsampled 8x
HASH_SIDE = 32  # pHash working size (resize target before DCT)


# --------------------------------------------------------------------------
# fixture image synthesis: one base raster per img_id, three encodings
# --------------------------------------------------------------------------


def phash_raster(img_id: int, delta: int = 0) -> np.ndarray:
    """The deterministic 64x64 gray base raster for ``img_id``: an 8x8
    coarse grid of seeded-random levels upsampled 8x (strong
    low-frequency structure, so the DCT coefficients sit far from the
    median and the hash is stable under small noise).  ``delta`` > 0
    perturbs three coarse cells by +-16*delta (clipped) — the
    variant-2 noise.  Measured spread at delta = img_id % 5: roughly
    40% of perturbed variants stay at hamming 0, 40% land at 2 (found
    by the banded join), 20% exceed the <=3 threshold (correctly
    dropped) — both keep and drop paths are exercised.  Hamming is
    always EVEN here: the median threshold fixes the popcount at 31 of
    63 non-DC bits, so perturbations flip bits in pairs."""
    rng = np.random.RandomState(img_id % (2**31))
    coarse = rng.randint(0, 256, (_COARSE, _COARSE)).astype(np.int64)
    if delta:
        for t in range(3):
            cell = (img_id * 7 + t * 13) % (_COARSE * _COARSE)
            sgn = 1 if (img_id + t) % 2 == 0 else -1
            coarse[cell // _COARSE, cell % _COARSE] = np.clip(
                coarse[cell // _COARSE, cell % _COARSE] + sgn * 16 * delta,
                0,
                255,
            )
    scale = RASTER_SIDE // _COARSE
    return np.kron(coarse, np.ones((scale, scale), dtype=np.int64)).astype(
        np.uint8
    )


def encode_gray_ppm(gray: np.ndarray) -> bytes:
    """P6 PPM with R=G=B=v — a real binary PPM whose gray decode is
    exactly the input raster."""
    h, w = gray.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + np.repeat(gray.reshape(-1), 3).tobytes()


def encode_gray_png(gray: np.ndarray) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 rows) — byte-wise
    nothing like the PPM of the same raster, pixel-wise identical."""
    import struct
    import zlib

    h, w = gray.shape
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw.extend(gray[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = bytearray(_PNG_SIG)
    png.extend(_png_chunk(b"IHDR", ihdr))
    png.extend(_png_chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
    png.extend(_png_chunk(b"IEND", b""))
    return bytes(png)


def phash_payload(doc_id: int) -> bytes:
    """The fixture payload for one doc: variant = doc_id % 3 over the
    shared base raster img_id = doc_id // 3 (see module docstring)."""
    img_id, variant = divmod(int(doc_id), PHASH_VARIANTS)
    if variant == 0:
        return encode_gray_ppm(phash_raster(img_id))
    if variant == 1:
        return encode_gray_png(phash_raster(img_id))
    return encode_gray_ppm(phash_raster(img_id, delta=img_id % 5))


def decode_gray(payload: bytes) -> np.ndarray:
    """Codec-dispatching gray decode: P6 PPM (channel 0 of the RGB
    raster — the encoder replicates gray across channels) or PNG via
    the full multimodal parser.  Color inputs fold to the per-pixel
    channel mean, the standard pHash luminance reduction."""
    if payload[:2] == b"P6":
        w, h, _maxval, off = _ppm_header(payload)
        rgb = np.frombuffer(
            payload[off : off + w * h * 3], dtype=np.uint8
        ).reshape(h, w, 3)
        return rgb.mean(axis=2)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        _w, _h, img = _png_parse(payload)
        return img.astype(np.float64).mean(axis=2)
    raise ValueError("phash: payload is neither P6 PPM nor PNG")


# --------------------------------------------------------------------------
# the hash: area-resize -> DCT-II -> 8x8 corner -> median threshold
# --------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: row k is sqrt(2/n)*cos(pi*(2x+1)k/2n),
    row 0 scaled by 1/sqrt(2).  2-D DCT is then D @ A @ D.T — two
    32x32 GEMMs per image, no scipy dependency."""
    k = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix(HASH_SIDE)


def _area_resize(img: np.ndarray, side: int = HASH_SIDE) -> np.ndarray:
    """Box-filter (area-mean) resize to side x side via a 2-D summed
    area table — the pHash-standard downsample (mean over each source
    box), exact for any input size >= side.  Smaller inputs are
    integer-upsampled first (np.kron) so the box grid is well-formed."""
    h, w = img.shape
    if h < side or w < side:
        ry = -(-side // h)  # ceil
        rx = -(-side // w)
        img = np.kron(img, np.ones((ry, rx)))
        h, w = img.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    c = np.zeros((h + 1, w + 1), dtype=np.float64)
    c[1:, 1:] = img.cumsum(axis=0).cumsum(axis=1)
    s = (
        c[ys[1:, None], xs[None, 1:]]
        - c[ys[:-1, None], xs[None, 1:]]
        - c[ys[1:, None], xs[None, :-1]]
        + c[ys[:-1, None], xs[None, :-1]]
    )
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return s / area


def phash64(gray: np.ndarray) -> int:
    """The 64-bit perceptual hash of one grayscale raster, as a SIGNED
    int64 (Spark LongType; hamming distance is bit_count(xor), sign
    bit included).  Bit i corresponds to row-major low-frequency DCT
    coefficient i; the DC term (i=0) is excluded from the median so a
    global brightness shift cannot recenter the threshold."""
    small = _area_resize(np.asarray(gray, dtype=np.float64))
    coef = (_DCT @ small @ _DCT.T)[:8, :8].ravel()
    med = np.median(coef[1:])
    return pack_bits64(coef > med)


# DataType objects (not DDL strings): a string return type would need
# an active SparkContext at import time (house rule, dedup.py).
@F.pandas_udf(T.BinaryType())
def _phash_payload_udf(doc_id: pd.Series) -> pd.Series:
    return pd.Series([phash_payload(int(d)) for d in doc_id])


@F.pandas_udf(T.LongType())
def phash_of(payload: pd.Series) -> pd.Series:
    """Arrow-vectorized payload -> pHash: one decode + two 32x32 GEMMs
    per image inside the batch loop — the per-image cost is decode-
    dominated, exactly like the rest of the codec tier."""
    return pd.Series(
        [phash64(decode_gray(bytes(p))) for p in payload], dtype=np.int64
    )


def _phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized (doc_id, phash) signature table over the synthetic
    image corpus — the 16-byte/row store a production pipeline
    persists at ingest (see hamming_band_pairs for why materialize)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.select(
        "doc_id", _phash_payload_udf(F.col("doc_id")).alias("payload")
    )
    return materialize(
        payloads.select("doc_id", phash_of(F.col("payload")).alias("phash"))
    )


@register(
    "multimodal_phash_dedup",
    oracle=None,  # DCT arithmetic is not portable SQL; the oracle-
    # backed multimodal_phash_census pins banding == brute force plus
    # the closed-form raster-twin count.
    description="perceptual image near-dup: DCT pHash64 + combination banding, hamming<=3",
    tags=("multimodal", "dedup", "approx"),
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the binary image column: decode
    -> pHash64 -> the exact hamming<=3 combination-banding join shared
    with ``simhash_dedup``.  Catches codec re-encodes (PPM vs PNG of
    one raster: hamming 0) and small pixel perturbations (hamming
    1..3) that ``multimodal_dedup``'s byte-hash can never see."""
    return hamming_band_pairs(_phash_signatures(spark, sf_dir), "phash")


@register(
    "multimodal_phash_census",
    oracle="""
WITH td AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id % 3 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_raster_twin_pairs,
       TRUE AS twins_found_h0,
       TRUE AS banding_lossless
FROM td
""",
    description="driver-checked: pHash banding == brute-force hamming pairs; codec twins at hamming 0",
    bench=False,
    tags=("multimodal", "dedup", "approx", "census"),
)
def q_multimodal_phash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pHash guarantee on the driver surface, mirroring
    ``simhash_recall_census``: (1) the banded candidate join must
    equal a brute-force all-pairs hamming scan over the signature
    table (banding_lossless — the census's deliberate n² expense,
    verification only); (2) every PPM/PNG raster-twin pair (variants
    0 and 1 of one img_id — pure doc_id arithmetic, so DuckDB predicts
    the count independently) must be FOUND at hamming exactly 0,
    because pixel-identical images pHash identically regardless of
    codec."""
    return banding_census(
        _phash_signatures(spark, sf_dir), "phash", _twin_pairs(spark, sf_dir)
    ).withColumnRenamed("n_twin_pairs", "n_raster_twin_pairs")


def _twin_pairs(
    spark: SparkSession, sf_dir: str, delta_only: bool = False
) -> DataFrame:
    """The closed-form raster-twin pairs (variants 0 and 1 of one
    img_id — consecutive ids, a % 3 == 0), optionally restricted to
    pairs touching the delta batch; pure doc_id arithmetic, mirrored
    exactly by the censuses' DuckDB oracles."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    cond = (F.col("y.doc_id") == F.col("x.doc_id") + 1) & (
        F.col("x.doc_id") % PHASH_VARIANTS == 0
    )
    if delta_only:
        cond = cond & (
            (F.col("x.doc_id") % DELTA_PERIOD == 0)
            | (F.col("y.doc_id") % DELTA_PERIOD == 0)
        )
    return (
        docs.alias("x")
        .join(docs.alias("y"), cond)
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )


# --------------------------------------------------------------------------
# incremental (CDC) perceptual dedup — the refresh-cycle twin, completing
# the maintenance story for the perceptual family (exact:
# incremental_dedup; MinHash: incremental_near_dedup; pHash: this).
# --------------------------------------------------------------------------

DELTA_PERIOD = 5  # every 5th doc is the arriving CDC batch


def _is_delta(col: str = "doc_id") -> "F.Column":
    # a function (not a module-level Column) because Column
    # construction needs a live session
    return F.col(col) % DELTA_PERIOD == 0


@register(
    "incremental_phash_dedup",
    oracle=None,  # DCT arithmetic is not portable SQL; the oracle-
    # backed incremental_phash_census pins incremental == full-
    # restricted plus the closed-form delta-twin count.
    description="incremental perceptual dedup: delta images banded against the stored pHash combo table",
    tags=("multimodal", "dedup", "approx", "maintenance", "cdc"),
)
def q_incremental_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``incremental_near_dedup``'s refresh-cycle contract for the
    perceptual image family: when a delta batch arrives (every 5th
    doc), its pHash combo keys join against the corpus's STORED combo
    table (``combo_chunks`` — 10 longs per doc, persisted at ingest)
    plus earlier arrivals in its own batch; candidates are bit_count-
    verified.  The base corpus is never re-decoded, re-hashed, or
    re-paired — cost scales with the delta.

    Because a doc's pHash depends only on its payload, the result is
    EXACTLY the full ``multimodal_phash_dedup`` pairs restricted to
    pairs touching the delta — the batch/incremental equivalence the
    census hash-checks."""
    return _incremental_pairs(_phash_signatures(spark, sf_dir))


def _incremental_pairs(s: DataFrame) -> DataFrame:
    """Delta-vs-(base + earlier-delta) banded pairs over one signature
    table (see q_incremental_phash_dedup for the contract)."""
    # the stored tables a production pipeline persists at ingest: the
    # signature store and its banding; materialized because multiple
    # join branches consume them (see hamming_band_pairs)
    chunks = materialize(combo_chunks(s, "phash"))
    d = chunks.filter(_is_delta())
    b = chunks.filter(~_is_delta())
    x, y = d.alias("x"), b.alias("y")
    d2b = x.join(y, F.col("x.cv") == F.col("y.cv")).select(
        F.least("x.doc_id", "y.doc_id").alias("doc_a"),
        F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
        F.col("x.phash").alias("sa"),
        F.col("y.phash").alias("sb"),
    )
    e, f2 = d.alias("e"), d.alias("f")
    d2d = e.join(
        f2,
        (F.col("e.cv") == F.col("f.cv"))
        & (F.col("e.doc_id") < F.col("f.doc_id")),
    ).select(
        F.col("e.doc_id").alias("doc_a"),
        F.col("f.doc_id").alias("doc_b"),
        F.col("e.phash").alias("sa"),
        F.col("f.phash").alias("sb"),
    )
    cand = d2b.unionByName(d2d).distinct()
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.filter(ham <= HAMMING_MAX).select(
        "doc_a", "doc_b", ham.alias("hamming")
    )


@register(
    "incremental_phash_census",
    oracle="""
WITH td AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id % 3 = 0
   AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
)
SELECT CAST(count(*) AS BIGINT) AS n_delta_twin_pairs,
       TRUE AS twins_found_h0,
       TRUE AS incremental_equals_restricted_full
FROM td
""",
    description="driver-checked: incremental pHash delta pairs == full banding restricted to the delta; delta twins at hamming 0",
    bench=False,
    tags=("multimodal", "dedup", "approx", "census", "cdc"),
)
def q_incremental_phash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC guarantee on the driver surface: (1) the incremental
    result must equal the FULL corpus banding restricted to pairs
    touching the delta — same pairs, same hamming values, none extra
    (full_outer hash-checked); (2) the raster twins (variants 0/1 of
    one img_id) that touch the delta — pure doc_id arithmetic, DuckDB
    predicts the count — must each be found at hamming 0."""
    # ONE signature build feeds both sides (the decode+pHash pass over
    # the corpus is the dominant cost; review r13)
    sig = _phash_signatures(spark, sf_dir)
    inc = _incremental_pairs(sig)
    full = hamming_band_pairs(sig, "phash")
    touching = full.filter(
        (F.col("doc_a") % DELTA_PERIOD == 0)
        | (F.col("doc_b") % DELTA_PERIOD == 0)
    )
    both = inc.withColumnRenamed("hamming", "h_inc").join(
        touching.withColumnRenamed("hamming", "h_full"),
        ["doc_a", "doc_b"],
        "full_outer",
    )
    equal = both.agg(
        F.coalesce(
            F.bool_and(
                F.col("h_inc").isNotNull()
                & F.col("h_full").isNotNull()
                & (F.col("h_inc") == F.col("h_full"))
            ),
            F.lit(True),
        ).alias("incremental_equals_restricted_full")
    )
    td = _twin_pairs(spark, sf_dir, delta_only=True)
    found = td.join(
        inc.filter(F.col("hamming") == 0), ["doc_a", "doc_b"], "left_semi"
    )
    counts = td.agg(F.count("*").alias("n_twins")).crossJoin(
        found.agg(F.count("*").alias("n_found"))
    )
    return counts.crossJoin(equal).select(
        F.col("n_twins").cast("long").alias("n_delta_twin_pairs"),
        (F.col("n_found") == F.col("n_twins")).alias("twins_found_h0"),
        "incremental_equals_restricted_full",
    )
