"""Multimodal-column plumbing (north-star, SURVEY.md §2.3).

Treats media as opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` — the pattern a 100 TB
image/audio pipeline uses (decode / resize / frame-sample per batch on
executors, no driver involvement, no row-at-a-time Python).

Codec tiers (r7, PNG promoted r8):

* UNCOMPRESSED container formats have REAL decoders with zero external
  dependencies — a hand-written P6 PPM header parser + numpy raster
  (``decode_ppm``) and stdlib ``wave`` for RIFF/PCM audio
  (``decode_wav``).  ``multimodal_image_decode`` /
  ``multimodal_audio_decode`` round-trip real encoded payloads through
  them, oracle-checked: the synthesis parameters are deterministic
  functions of (doc_id, n_chars), so DuckDB independently predicts
  every decoded feature and a parser bug breaks the driver hash.
* PNG — the most common real compressed image format — has a REAL
  stdlib-only decoder (r8, ``decode_png``): CRC-verified chunk walk,
  concatenated-IDAT zlib inflate, and full inversion of the five
  per-row filters; ``multimodal_png_decode`` round-trips payloads
  whose rows cycle all five filters, oracle-checked the same way.
* Remaining compressed codecs (JPEG/...) stay import-gated behind PIL
  (absent in this container): ``real_decode`` dispatches P6/PNG to
  the builtin parsers and everything else to PIL or a
  ``NotImplementedError`` — the documented honest stub.
* The original ``multimodal_features`` fake path is kept as the
  codec-independent plumbing check (binary schema, Arrow batch
  iteration, UDF signature, partition-parallel execution).

Scale posture: ``mapInPandas`` is a narrow transformation (no shuffle);
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so executor memory stays flat regardless of corpus size.  Feature
extraction parallelism == input partition count.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import table
from ..registry import register

# This module's functions execute inside Python workers (mapInPandas).
# Serialize them BY VALUE so executors need not import this package --
# the driver process is the only place the repo is on sys.path (and on
# a real cluster this removes the --py-files deployment dependency for
# the hot path).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

try:  # pragma: no cover - the real decoder needs PIL, absent in this env
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_SCHEMA = "doc_id long, n_bytes long, width long, height long, checksum long"


def real_decode(payload: bytes) -> tuple[int, int]:
    """Actual image decode: builtin parsers for P6 PPM (no dependency)
    and PNG (stdlib zlib — r8, see ``decode_png``), PIL for the
    remaining compressed codecs (JPEG/...) when installed."""
    if payload[:2] == b"P6":
        w, h, _maxval, _off = _ppm_header(payload)
        return w, h
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        w, h, _mean, _mx, _sum = decode_png(payload)
        return w, h
    if not HAVE_PIL:  # pragma: no cover - PIL absent in this env
        raise NotImplementedError(
            "JPEG-tier decoding requires PIL; this environment ships "
            "none -- builtin decoders cover P6 PPM, PNG, and WAV"
        )
    import io  # pragma: no cover

    import PIL.Image  # pragma: no cover

    with PIL.Image.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.size


def fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for (width, height, checksum): pure
    functions of the bytes so the DuckDB oracle can recompute them."""
    n = len(payload)
    width = n % 640
    height = (n * 31) % 480
    checksum = (payload[0] + payload[-1]) if n else 0
    return width, height, checksum


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "width": payloads.map(lambda b: fake_features(b)[0]),
                "height": payloads.map(lambda b: fake_features(b)[1]),
                "checksum": payloads.map(lambda b: fake_features(b)[2]),
            }
        )


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       octet_length(encode(text)) % 640 AS width,
       (octet_length(encode(text)) * 31) % 480 AS height,
       CASE WHEN length(text) > 0
            THEN ascii(substr(text, 1, 1)) + ascii(substr(text, length(text), 1))
            ELSE 0 END AS checksum
FROM documents
""",
    description="binary payload -> typed features via Arrow-batched mapInPandas",
    tags=("multimodal", "udf"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture has no real media, so the binary payload is the
    utf-8 document text; the point under test is the binary column +
    mapInPandas batch pipeline, not the codec."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# frame sampling — the 1->N shape (video frame extract / audio chunking)
# --------------------------------------------------------------------------

FRAME_BYTES = 256  # stand-in for a frame/chunk stride

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes long, head_byte long"


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker emitting one row per FRAME_BYTES-sized chunk of
    the payload — the row-expanding shape a video frame-sampler or audio
    chunker has (a real decoder slots into the per-frame loop)."""
    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        sizes: list[int] = []
        heads: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            for k, off in enumerate(range(0, n, FRAME_BYTES)):
                doc_ids.append(doc_id)
                idxs.append(k)
                sizes.append(min(FRAME_BYTES, n - off))
                heads.append(payload[off])
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_bytes": sizes, "head_byte": heads}
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS n, text,
         unnest(generate_series(
           0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) - 1))
           AS frame_idx
  FROM documents
  WHERE octet_length(encode(text)) > 0
)
SELECT doc_id, frame_idx,
       least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS frame_bytes,
       ascii(substr(text, frame_idx * {FRAME_BYTES} + 1, 1)) AS head_byte
FROM f
""",
    description="1->N frame/chunk sampling of binary payloads via mapInPandas",
    tags=("multimodal", "udf"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding mapInPandas: output cardinality is decoupled from
    input cardinality (Arrow batches re-chunk downstream), which is the
    plumbing a frame sampler needs.  The oracle recomputes the chunk
    geometry with generate_series (fixture text is ASCII, so byte
    offsets == char offsets)."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# multimodal_dedup — exact dedup over the BINARY payload column
# --------------------------------------------------------------------------


@register(
    "multimodal_dedup",
    oracle="""
WITH h AS (
  -- sha256 in DuckDB is VARCHAR-only; it hashes the UTF-8 bytes, which
  -- are exactly the payload bytes the Spark side hashes as binary
  SELECT doc_id, sha256(text) AS payload_hash,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       count(*) AS n_copies,
       CAST(any_value(n_bytes) AS BIGINT) AS n_bytes,
       payload_hash
FROM h GROUP BY payload_hash
""",
    description="exact dedup over the binary payload column (sha256 of bytes)",
    tags=("multimodal", "dedup"),
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``exact_dedup``'s semantics applied to the BINARY column — the
    first pass every image/audio corpus runs (bit-identical files are
    rampant in crawled media).  Hashing happens directly on the bytes
    (``sha2`` accepts binary; no decode, no UDF), so the plan is one
    projection + one hash shuffle regardless of payload size, and the
    hash can be computed at INGEST and stored alongside the payload —
    after which dedup never touches the bytes again (the
    ``incremental_dedup`` pattern)."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
    )
    return (
        payloads.select(
            "doc_id",
            F.sha2("payload", 256).alias("payload_hash"),
            F.length("payload").cast("long").alias("n_bytes"),
        )
        .groupBy("payload_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
            F.first("n_bytes").alias("n_bytes"),
        )
        .select("keeper_doc_id", "n_copies", "n_bytes", "payload_hash")
    )


# --------------------------------------------------------------------------
# REAL codecs, dependency-free tier (r7): P6 PPM images, RIFF/PCM WAV
# audio.  The synthesis parameters are deterministic functions of
# (doc_id, n_chars), so the DuckDB oracles predict every DECODED
# feature independently — the decoders are genuinely exercised and a
# parser bug (wrong header scan, wrong raster offset, wrong PCM dtype)
# fails the driver hash, not just a local test.
# --------------------------------------------------------------------------

import numpy as np  # noqa: E402  (worker-side import, shipped by value)

PPM_MAXVAL = 255
WAV_RATE = 8000


def encode_ppm(doc_id: int, n_chars: int) -> bytes:
    """A real binary P6 PPM: ASCII header + raw RGB raster.  Dimensions
    and fill derive from (doc_id, n_chars) so the oracle can predict
    the decode output."""
    w = n_chars % 64 + 1
    h = doc_id % 48 + 1
    fill = doc_id % 256
    header = f"P6\n{w} {h}\n{PPM_MAXVAL}\n".encode()
    return header + bytes([fill]) * (w * h * 3)


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header byte-by-byte: three whitespace-separated
    integers (width, height, maxval) after the magic, then EXACTLY one
    whitespace before the raster.  ``bytes.split`` would eat raster
    bytes that happen to be whitespace (fill values 9/10/13/32), so
    the scan is manual.  Returns (w, h, maxval, raster_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    i, vals = 2, []
    while len(vals) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals[0], vals[1], vals[2], i + 1


def decode_ppm(payload: bytes) -> tuple[int, int, int, float, int]:
    """(width, height, n_raster_bytes, mean_pixel, max_pixel) from a
    real P6 parse — header scan + numpy raster view."""
    w, h, _maxval, off = _ppm_header(payload)
    raster = np.frombuffer(payload[off : off + w * h * 3], dtype=np.uint8)
    return (
        w,
        h,
        int(raster.size),
        float(raster.mean()) if raster.size else 0.0,
        int(raster.max()) if raster.size else 0,
    )


def encode_wav(doc_id: int, n_chars: int) -> bytes:
    """A real RIFF/PCM WAV (stdlib ``wave``): mono 16-bit at WAV_RATE,
    an alternating +/-amp square wave whose frame count and amplitude
    derive from (n_chars, doc_id)."""
    import io
    import wave

    n_frames = n_chars % 400 + 50
    amp = doc_id % 100 + 1
    frames = np.empty(n_frames, dtype="<i2")
    frames[0::2] = amp
    frames[1::2] = -amp
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(frames.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, int, float, int]:
    """(n_channels, sample_width, frame_rate, n_frames, duration_ms,
    peak) via a real stdlib ``wave`` parse of the RIFF container plus a
    numpy PCM scan."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        nf = w.getnframes()
        data = np.frombuffer(w.readframes(nf), dtype="<i2")
    peak = int(np.abs(data).max()) if data.size else 0
    return nch, sw, rate, nf, round(nf * 1000.0 / rate, 3), peak


# DataType objects (not DDL strings): a string return type would need
# an active SparkContext at import time (same rationale as dedup.py).
@F.pandas_udf(T.BinaryType())
def _ppm_payload(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
    return pd.Series(
        [encode_ppm(int(d), int(n)) for d, n in zip(doc_id, n_chars)]
    )


@F.pandas_udf(T.BinaryType())
def _wav_payload(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
    return pd.Series(
        [encode_wav(int(d), int(n)) for d, n in zip(doc_id, n_chars)]
    )


IMG_SCHEMA = (
    "doc_id long, width long, height long, n_raster_bytes long,"
    " mean_pixel double, max_pixel long"
)


def decode_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_ppm(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_raster_bytes": [f[2] for f in feats],
                "mean_pixel": [round(f[3], 3) + 0.0 for f in feats],
                "max_pixel": [f[4] for f in feats],
            }
        )


@register(
    "multimodal_image_decode",
    oracle="""
SELECT doc_id,
       CAST(n_chars % 64 + 1 AS BIGINT) AS width,
       CAST(doc_id % 48 + 1 AS BIGINT) AS height,
       CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) * 3 AS BIGINT)
         AS n_raster_bytes,
       round(CAST(doc_id % 256 AS DOUBLE), 3) + 0 AS mean_pixel,
       CAST(doc_id % 256 AS BIGINT) AS max_pixel
FROM documents
""",
    description="REAL image decode: encode P6 PPM -> binary column -> parse header + numpy raster",
    tags=("multimodal", "udf", "codec"),
)
def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips every document through a REAL image codec: a binary
    P6 PPM is encoded from (doc_id, n_chars), materialized as a binary
    column, and decoded by the hand-written header parser + numpy
    raster scan.  The oracle predicts the decoded width/height/raster
    stats straight from the parameters, so the driver hash fails on
    any parser defect.  Plan shape: two narrow Arrow stages, no
    shuffle — decode parallelism == input partitions, the 100 TB media
    ingest shape."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", _ppm_payload("doc_id", "n_chars").alias("payload")
    )
    return payloads.mapInPandas(decode_images, schema=IMG_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_channels long, sample_width long, frame_rate long,"
    " n_frames long, duration_ms double, peak long"
)


def decode_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_wav(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_channels": [f[0] for f in feats],
                "sample_width": [f[1] for f in feats],
                "frame_rate": [f[2] for f in feats],
                "n_frames": [f[3] for f in feats],
                "duration_ms": [f[4] + 0.0 for f in feats],
                "peak": [f[5] for f in feats],
            }
        )


@register(
    "multimodal_audio_decode",
    oracle=f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(2 AS BIGINT) AS sample_width,
       CAST({WAV_RATE} AS BIGINT) AS frame_rate,
       CAST(n_chars % 400 + 50 AS BIGINT) AS n_frames,
       round((n_chars % 400 + 50) * 1000.0 / {WAV_RATE}, 3) + 0
         AS duration_ms,
       CAST(doc_id % 100 + 1 AS BIGINT) AS peak
FROM documents
""",
    description="REAL audio decode: encode RIFF/PCM WAV -> binary column -> stdlib wave parse + PCM peak",
    tags=("multimodal", "udf", "codec"),
)
def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips every document through a REAL audio codec: a RIFF
    PCM WAV encoded with stdlib ``wave`` from (doc_id, n_chars),
    decoded back through ``wave`` plus a numpy PCM peak scan.  The
    oracle predicts container metadata (channels, sample width, rate,
    frame count), duration, and the square wave's peak amplitude, so
    the driver hash fails on any RIFF/PCM parsing defect.  Same
    narrow two-stage Arrow shape as the image path."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", _wav_payload("doc_id", "n_chars").alias("payload")
    )
    return payloads.mapInPandas(decode_audio, schema=AUDIO_SCHEMA)


# --------------------------------------------------------------------------
# REAL compressed codec, dependency-free (r8): PNG via stdlib zlib.
# The critical path of the most common real image format — 8-byte
# signature, chunk walk with CRC32 verification, IHDR, zlib-inflated
# IDAT (possibly split across chunks), and the five per-row filters
# (None/Sub/Up/Average/Paeth, RFC 2083 §6) — needs NOTHING beyond
# stdlib zlib, so it graduates from the PIL stub tier to a real
# decoder.  The synthesis encoder cycles the filter type per row
# (y % 5), so every decode inverts all five filters; a defilter bug in
# any of them shifts the pixel stats and breaks the driver hash.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel
_PNG_IDAT_SPLIT = 512  # encoder splits IDAT so decode exercises concat


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/upper-left
    to the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(doc_id: int, n_chars: int) -> bytes:
    """A real 8-bit RGB PNG.  Row y is a constant fill
    ``(doc_id + y) % 256`` filtered with type ``y % 5``, so the
    compressed stream round-trips through every filter; dimensions
    derive from (doc_id, n_chars) exactly like the PPM tier so the
    oracle predicts the decode."""
    import struct
    import zlib

    w = n_chars % 64 + 1
    h = doc_id % 48 + 1
    bpp = 3
    prior = np.zeros(w * bpp, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        raw = np.full(w * bpp, (doc_id + y) % 256, dtype=np.int64)
        ft = y % 5
        if ft == 0:
            filt = raw
        elif ft == 1:  # Sub: left neighbor, bpp back
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]])
            filt = raw - left
        elif ft == 2:  # Up
            filt = raw - prior
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]])
            filt = raw - (left + prior) // 2
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]])
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int64), prior[:-bpp]]
            )
            pred = np.array(
                [
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prior, upleft)
                ],
                dtype=np.int64,
            )
            filt = raw - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    z = zlib.compress(bytes(out), 6)
    png = bytearray(_PNG_SIG)
    png.extend(_png_chunk(b"IHDR", ihdr))
    # split IDAT: multi-chunk streams are legal and common; decoders
    # must concatenate before inflating
    for i in range(0, len(z), _PNG_IDAT_SPLIT):
        png.extend(_png_chunk(b"IDAT", z[i : i + _PNG_IDAT_SPLIT]))
    png.extend(_png_chunk(b"IEND", b""))
    return bytes(png)


def decode_png(payload: bytes) -> tuple[int, int, float, int, int]:
    """(width, height, mean_pixel, max_pixel, pixel_sum) from a REAL
    PNG parse: signature check, chunk walk with CRC32 verification,
    IHDR, concatenated-IDAT zlib inflate, and full defiltering of the
    five per-row filters.  Supports the non-interlaced 8-bit
    gray/RGB/gray+alpha/RGBA color types (the decode loop is generic
    over samples-per-pixel); rejects interlace, palette, and sub-byte
    depths loudly rather than mis-decoding."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = len(_PNG_SIG)
    idat = bytearray()
    w = h = depth = ctype = interlace = None
    while i < len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", payload[i + 8 + length : i + 12 + length])
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        i += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={interlace}); supported: 8-bit non-interlaced "
            "gray/RGB/gray+alpha/RGBA"
        )
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG IDAT size does not match dimensions")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up is vectorizable
            rec = line + prior
        else:  # Sub/Average/Paeth need the already-reconstructed left
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + prior[x]) // 2
                elif ft == 4:
                    upleft = prior[x - bpp] if x >= bpp else 0
                    pred = _paeth(int(left), int(prior[x]), int(upleft))
                else:
                    raise ValueError(f"PNG filter type {ft} out of range")
                # reduce EACH byte before it becomes the next left
                # neighbor: predictors operate on reconstructed BYTES
                # (RFC 2083 §6.3), so an unreduced v+256 here would
                # poison the Average/Paeth prediction 3 bytes later
                rec[x] = (line[x] + pred) % 256
        out[y] = rec % 256
    px = out.reshape(-1)
    return (
        int(w),
        int(h),
        float(px.mean()) if px.size else 0.0,
        int(px.max()) if px.size else 0,
        int(px.sum(dtype=np.int64)),
    )


@F.pandas_udf(T.BinaryType())
def _png_payload(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
    return pd.Series(
        [encode_png(int(d), int(n)) for d, n in zip(doc_id, n_chars)]
    )


PNG_SCHEMA = (
    "doc_id long, width long, height long, mean_pixel double,"
    " max_pixel long, pixel_sum long"
)


def decode_pngs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_png(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_pixel": [round(f[2], 3) + 0.0 for f in feats],
                "max_pixel": [f[3] for f in feats],
                "pixel_sum": [f[4] for f in feats],
            }
        )


@register(
    "multimodal_png_decode",
    # the oracle rebuilds the per-row fill (doc_id + y) % 256 with
    # generate_series and aggregates — a fully independent recompute of
    # the decoded raster statistics (w*3 identical samples per row)
    oracle="""
WITH dims AS (
  SELECT doc_id, n_chars % 64 + 1 AS w, doc_id % 48 + 1 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y FROM dims
)
SELECT doc_id,
       CAST(any_value(w) AS BIGINT) AS width,
       CAST(any_value(h) AS BIGINT) AS height,
       round(avg((doc_id + y) % 256), 3) + 0 AS mean_pixel,
       CAST(max((doc_id + y) % 256) AS BIGINT) AS max_pixel,
       CAST(sum(((doc_id + y) % 256) * w * 3) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id
""",
    description="REAL compressed-codec decode: zlib PNG (chunk walk + CRC + inflate + 5 row filters)",
    tags=("multimodal", "udf", "codec"),
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips every document through a REAL compressed image
    codec: an 8-bit RGB PNG whose rows cycle all five PNG filters is
    encoded from (doc_id, n_chars), zlib-compressed, split across
    IDAT chunks, then decoded by the stdlib-only parser (CRC-verified
    chunk walk, inflate, full defilter).  The oracle rebuilds the
    expected raster statistics from the synthesis parameters with
    generate_series, so any defect in the chunk walk, the inflate
    plumbing, or ANY of the five filter inversions breaks the driver
    hash.  Plan shape: two narrow Arrow stages, no shuffle — decode
    parallelism == input partitions, the 100 TB media-ingest shape."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", _png_payload("doc_id", "n_chars").alias("payload")
    )
    return payloads.mapInPandas(decode_pngs, schema=PNG_SCHEMA)
