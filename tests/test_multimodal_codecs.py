"""Unit tests for the dependency-free real codecs (r7): P6 PPM header
parser + raster stats, stdlib wave RIFF/PCM roundtrip, and the
real_decode dispatch.  The oracle-parity harness covers the Spark
plumbing; these pin the parsers on adversarial payloads directly."""

from __future__ import annotations

import pytest

from inverted_index_using_the_map_reduce_paradigm_spark.operators.multimodal import (
    HAVE_PIL,
    decode_ppm,
    decode_wav,
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


def test_real_decode_dispatches_p6_without_pil():
    assert real_decode(encode_ppm(5, 70)) == (70 % 64 + 1, 5 % 48 + 1)
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            real_decode(b"\x89PNG\r\n\x1a\n not really")
