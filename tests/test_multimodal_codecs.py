"""Unit tests for the dependency-free real codecs (r7): P6 PPM header
parser + raster stats, stdlib wave RIFF/PCM roundtrip, and the
real_decode dispatch.  The oracle-parity harness covers the Spark
plumbing; these pin the parsers on adversarial payloads directly."""

from __future__ import annotations

import pytest

from inverted_index_using_the_map_reduce_paradigm_spark.operators.multimodal import (
    HAVE_PIL,
    _PNG_SIG,
    _png_chunk,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_wav,
    real_decode,
)


@pytest.mark.parametrize(
    "doc_id",
    # fill bytes that are ASCII whitespace (9 tab, 10 LF, 13 CR, 32
    # space): a split()-based header parse would eat the raster head
    [9, 10, 13, 32, 0, 255, 7, 1000 + 10],
)
def test_ppm_roundtrip_whitespace_fills(doc_id):
    payload = encode_ppm(doc_id, 130)
    w, h, n, mean, mx = decode_ppm(payload)
    assert (w, h) == (130 % 64 + 1, doc_id % 48 + 1)
    assert n == w * h * 3
    assert mean == float(doc_id % 256)
    assert mx == doc_id % 256


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n\x00" * 4)


def test_wav_roundtrip():
    payload = encode_wav(37, 123)
    nch, sw, rate, nf, dur, peak = decode_wav(payload)
    assert (nch, sw, rate) == (1, 2, 8000)
    assert nf == 123 % 400 + 50
    assert dur == round(nf * 1000.0 / 8000, 3)
    assert peak == 37 % 100 + 1
    # it really is a RIFF container
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def test_real_decode_dispatches_builtin_codecs_without_pil():
    assert real_decode(encode_ppm(5, 70)) == (70 % 64 + 1, 5 % 48 + 1)
    # PNG now routes to the builtin stdlib decoder (r8), not PIL
    assert real_decode(encode_png(5, 70)) == (70 % 64 + 1, 5 % 48 + 1)
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            real_decode(b"\xff\xd8\xff\xe0 jpeg-magic not really")


# --------------------------------------------------------------------------
# PNG (r8): stdlib-zlib decoder — chunk walk + CRC + inflate + 5 filters
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    # heights >= 5 exercise all five filters (encoder uses y % 5);
    # 255/256 cross the fill-value wraparound, 0/1 hit degenerate dims
    ("doc_id", "n_chars"),
    # 228/253: the 255->0 fill wraparound lands on an Average-filtered
    # row, which caught a real defilter bug (reconstructed bytes must
    # reduce mod 256 BEFORE feeding the next pixel's predictor — an
    # unreduced 256 poisoned Average/Paeth three bytes later); 250/999
    # wrap on the benign Sub/None rows, the rest are dimension edges
    [
        (0, 0),
        (1, 1),
        (4, 63),
        (47, 64),
        (228, 17),
        (250, 127),
        (253, 100),
        (255, 5000),
        (999, 13),
    ],
)
def test_png_roundtrip_matches_synthesis(doc_id, n_chars):
    w, h, mean, mx, s = decode_png(encode_png(doc_id, n_chars))
    W, H = n_chars % 64 + 1, doc_id % 48 + 1
    vals = [(doc_id + y) % 256 for y in range(H)]
    assert (w, h) == (W, H)
    assert abs(mean - sum(vals) / H) < 1e-9
    assert mx == max(vals)
    assert s == sum(v * W * 3 for v in vals)


def test_png_crc_corruption_detected():
    p = bytearray(encode_png(7, 100))
    p[p.find(b"IDAT") + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))


def test_png_rejects_interlace_and_bad_signature():
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # Adam7 flag
    with pytest.raises(NotImplementedError):
        decode_png(_PNG_SIG + _png_chunk(b"IHDR", ihdr))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


@pytest.mark.parametrize(("ctype", "bpp"), [(0, 1), (6, 4)])
def test_png_generic_color_types(ctype, bpp):
    """The defilter loop is generic over samples-per-pixel: hand-built
    gray and RGBA payloads (varying pixels, filter None) decode with
    exact raster statistics."""
    import struct
    import zlib

    w, h = 3, 4
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        rows.extend([(y * 10 + x) % 256 for x in range(w * bpp)])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )
    w2, h2, _mean, mx, s = decode_png(png)
    exp = [(y * 10 + x) % 256 for y in range(h) for x in range(w * bpp)]
    assert (w2, h2) == (w, h) and s == sum(exp) and mx == max(exp)
