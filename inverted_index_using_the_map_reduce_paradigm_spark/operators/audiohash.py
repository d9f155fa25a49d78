"""Perceptual AUDIO near-dup: spectral-band fingerprint over decoded PCM.

The audio twin of operators/phash.py, completing the perceptual-dedup
family over the engine's three media kinds (text: simhash_dedup;
image: multimodal_phash_dedup; audio: this).  The byte-hash pass
(``multimodal_dedup``) misses the dominant audio duplicate class in
crawled corpora — the same recording re-encoded, gain-normalized, or
lightly degraded.

The fingerprint is the band-energy-difference sign hash in the
Haitsma-Kalker tradition (ISMIR'02, "A Highly Robust Audio
Fingerprinting System"), collapsed to one 64-bit signature per clip:
decode the payload to PCM, take the magnitude spectrum (one rFFT —
numpy, no scipy), integrate it into 65 log-spaced bands, and set
bit b iff energy(band b) > energy(band b+1).  Sign-of-difference bits
are invariant under any uniform gain change (scaling all energies by
c² preserves every comparison EXACTLY), which is the classic
robustness claim — and the fixture's falsifiable twin: the
half-amplitude re-encode of a clip must land at hamming 0.

Candidate generation reuses ``dedup.hamming_band_pairs`` — the same
exact hamming<=3 combination banding as simhash/pHash, so the 100 TB
posture (sub-quadratic banded candidates, bit_count verify, 16-byte
signature rows computed once at ingest) is the one already proven
in-house twice.

Fixture synthesis (deterministic, oracle-predictable structure):
every 3 consecutive doc_ids share one base clip (``aud_id =
doc_id // 3``, a seeded mixture of 6 sinusoids at 8 kHz) — variant 0
is the clip as 16-bit PCM WAV, variant 1 the SAME clip at half
amplitude (gain change: byte-different, fingerprint-identical),
variant 2 adds a weak extra tone (hamming spread 0..~6, so the banded
join keeps some pairs and correctly drops others).  The (0,1) "gain
twin" pairs are pure doc_id arithmetic, so the census's DuckDB oracle
predicts their count in closed form while Spark proves each was FOUND
at hamming 0 and that banding == brute force.

Reference parity note: the reference engine (main.c++) has no audio
surface — north-star extension per SURVEY.md §2.3.
"""

from __future__ import annotations

import io
import sys
import wave

import numpy as np
import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import materialize, table
from ..registry import register
from .dedup import banding_census, hamming_band_pairs, pack_bits64

cloudpickle.register_pickle_by_value(sys.modules[__name__])

AFP_VARIANTS = 3  # docs per shared base clip in the fixture
AFP_RATE = 8000  # Hz
AFP_SAMPLES = 8000  # 1 s clips
_N_BANDS = 65  # 65 log-spaced bands -> 64 adjacent-difference bits
_N_TONES = 6


def afp_signal(aud_id: int, flip_k: int = 0) -> np.ndarray:
    """The deterministic base clip for ``aud_id``: BROADBAND by
    construction — one sinusoid per fingerprint band, pinned to the
    band's center FFT bin (integer cycles over the clip, so its energy
    lands exactly in-band), with per-band log-energies following a
    seeded +-0.45 random walk (reflected into [0, 6]).  Every adjacent
    band pair is therefore separated by a factor e^0.45 ~ 1.57, far
    above 16-bit quantization noise — which is what makes the
    gain-twin hamming-0 guarantee hold on REAL encoded bytes.  (A
    sparse-tone fixture fails here: bands holding only quantization
    noise compare noise against noise, and the noise floor does NOT
    scale with gain, so twin bits flipped — measured 58/80 mismatched
    twins before this construction.)

    ``flip_k`` inverts the walk direction at that many seeded
    positions — the variant-2 degradation; each flip moves one
    adjacent-band comparison, so hamming tracks flip_k (reflections
    can add a bit or two).  float64 in [-1, 1]."""
    rng = np.random.RandomState(aud_id % (2**31))
    dirs = (rng.randint(0, 2, _N_BANDS - 1) * 2 - 1).astype(np.float64)
    flip_pos = rng.randint(0, _N_BANDS - 1, 8)
    for p in flip_pos[:flip_k]:
        dirs[p] *= -1
    delta = 0.45
    u = np.empty(_N_BANDS)
    u[0] = rng.uniform(2.0, 4.0)
    for b in range(_N_BANDS - 1):
        nxt = u[b] + delta * dirs[b]
        if nxt < 0.0 or nxt > 6.0:
            nxt = u[b] - delta * dirs[b]  # reflect at the bounds
        u[b + 1] = nxt
    amps = np.sqrt(np.exp(u))
    edges = _band_edges(AFP_SAMPLES // 2 + 1)
    centers = (edges[:-1] + edges[1:]) // 2  # unique: bands are >=1 bin
    phases = rng.uniform(0, 2 * np.pi, _N_BANDS)
    n = np.arange(AFP_SAMPLES, dtype=np.float64)
    sig = np.zeros(AFP_SAMPLES)
    for b in range(_N_BANDS):
        sig += amps[b] * np.sin(
            2 * np.pi * centers[b] * n / AFP_SAMPLES + phases[b]
        )
    return sig / (np.abs(sig).max() + 1e-12)


def encode_pcm_wav(sig: np.ndarray, gain: float = 0.8) -> bytes:
    """16-bit mono PCM WAV of ``sig * gain`` (stdlib ``wave``) — the
    gain parameter is the fixture's volume-change twin knob."""
    pcm = np.clip(sig * gain * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AFP_RATE)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def afp_payload(doc_id: int) -> bytes:
    """Fixture payload: variant = doc_id % 3 over the shared base clip
    aud_id = doc_id // 3 (see module docstring)."""
    aud_id, variant = divmod(int(doc_id), AFP_VARIANTS)
    if variant == 0:
        return encode_pcm_wav(afp_signal(aud_id), gain=0.8)
    if variant == 1:
        return encode_pcm_wav(afp_signal(aud_id), gain=0.4)  # half volume
    return encode_pcm_wav(afp_signal(aud_id, flip_k=aud_id % 4), gain=0.8)


def decode_pcm(payload: bytes) -> np.ndarray:
    """WAV -> float64 PCM (mono fold for multi-channel), the luminance
    reduction's audio analogue."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("afp expects 16-bit PCM WAV")
        data = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    pcm = data.astype(np.float64)
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm


def _band_edges(n_freqs: int) -> np.ndarray:
    """66 log-spaced band edges over rFFT bins [1, n_freqs) — bin 0
    (DC) is excluded so a constant offset cannot contribute.  Rounded
    log-spacing collapses adjacent low-frequency edges onto the same
    bin, so edges are forced strictly increasing (each at least one
    bin past its predecessor) — every one of the 65 bands integrates
    at least one bin.  Requires n_freqs > _N_BANDS + 1 (any clip
    longer than ~16 ms at 8 kHz)."""
    if n_freqs <= _N_BANDS + 1:
        raise ValueError(f"afp: clip too short ({n_freqs} rFFT bins)")
    edges = np.round(
        np.exp(np.linspace(np.log(1.0), np.log(float(n_freqs - 1)), _N_BANDS + 1))
    ).astype(np.int64)
    for i in range(1, len(edges)):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    if edges[-1] > n_freqs - 1:
        raise ValueError("afp: band edges exceed spectrum length")
    return edges


def afp64(pcm: np.ndarray) -> int:
    """The 64-bit spectral fingerprint of one PCM clip, as a SIGNED
    int64 (Spark LongType): bit b = [energy(band b) > energy(band
    b+1)] over 65 log-spaced magnitude-spectrum bands.  Uniform gain
    scales every band energy by the same factor, so every comparison —
    and therefore the hash — is exactly unchanged."""
    spec = np.abs(np.fft.rfft(pcm)) ** 2
    edges = _band_edges(len(spec))
    c = np.concatenate([[0.0], np.cumsum(spec)])
    e = c[edges[1:]] - c[edges[:-1]]  # energy per band
    bits = e[:-1] > e[1:]
    if len(bits) != 64:
        raise ValueError(f"afp: {len(bits)} bands bits, expected 64")
    return pack_bits64(bits)


# DataType objects (not DDL strings): house rule, dedup.py.
@F.pandas_udf(T.BinaryType())
def _afp_payload_udf(doc_id: pd.Series) -> pd.Series:
    return pd.Series([afp_payload(int(d)) for d in doc_id])


@F.pandas_udf(T.LongType())
def afp_of(payload: pd.Series) -> pd.Series:
    """Arrow-vectorized payload -> fingerprint: one WAV parse + one
    rFFT per clip inside the batch loop, decode-dominated like the
    codec tier."""
    return pd.Series(
        [afp64(decode_pcm(bytes(p))) for p in payload], dtype=np.int64
    )


def _afp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized (doc_id, afp) signature table over the synthetic
    audio corpus (see hamming_band_pairs for why materialize)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.select(
        "doc_id", _afp_payload_udf(F.col("doc_id")).alias("payload")
    )
    return materialize(
        payloads.select("doc_id", afp_of(F.col("payload")).alias("afp"))
    )


@register(
    "multimodal_audiohash_dedup",
    oracle=None,  # FFT arithmetic is not portable SQL; the oracle-
    # backed multimodal_audiohash_census pins banding == brute force
    # plus the closed-form gain-twin count.
    description="perceptual audio near-dup: spectral-band fingerprint64 + combination banding, hamming<=3",
    tags=("multimodal", "dedup", "approx"),
)
def q_multimodal_audiohash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual near-dup pairs over the binary audio column: decode
    -> spectral fingerprint -> the exact hamming<=3 combination-
    banding join shared with simhash/pHash.  Catches gain changes
    (half-volume re-encode: hamming 0) and light additive degradation
    (hamming 1..3) that the byte-hash pass can never see."""
    return hamming_band_pairs(_afp_signatures(spark, sf_dir), "afp")


@register(
    "multimodal_audiohash_census",
    oracle="""
WITH td AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1 AND a.doc_id % 3 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_gain_twin_pairs,
       TRUE AS twins_found_h0,
       TRUE AS banding_lossless
FROM td
""",
    description="driver-checked: audio fingerprint banding == brute-force hamming pairs; gain twins at hamming 0",
    bench=False,
    tags=("multimodal", "dedup", "approx", "census"),
)
def q_multimodal_audiohash_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fingerprint guarantee on the driver surface, mirroring
    ``multimodal_phash_census``: (1) the banded candidate join must
    equal a brute-force all-pairs hamming scan over the signature
    table (banding_lossless — deliberate n² verification expense);
    (2) every gain-twin pair (variants 0 and 1 of one aud_id — pure
    doc_id arithmetic, so DuckDB predicts the count independently)
    must be FOUND at hamming exactly 0, because sign-of-band-energy-
    difference bits are invariant under uniform gain."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    twins = (
        docs.alias("x")
        .join(
            docs.alias("y"),
            (F.col("y.doc_id") == F.col("x.doc_id") + 1)
            & (F.col("x.doc_id") % AFP_VARIANTS == 0),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )
    return banding_census(
        _afp_signatures(spark, sf_dir), "afp", twins
    ).withColumnRenamed("n_twin_pairs", "n_gain_twin_pairs")
