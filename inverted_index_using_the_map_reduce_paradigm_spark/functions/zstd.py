"""A from-scratch zstandard (RFC 8878) frame decoder.

zstd is the codec modern training corpora actually ship in
(`.jsonl.zst` — The Pile, RedPajama, DCLM) and one of the three
parquet page codecs, so a 100 TB ingest engine must own its critical
path.  This module implements the full single-frame decode pipeline
with no compression library:

  * frame header (FHD flags, window descriptor, all four FCS widths,
    dictionary-id skip, optional xxHash64 content checksum — the hash
    itself hand-rolled below);
  * the three block types (raw, RLE, compressed);
  * literals section: raw / RLE / Huffman-compressed (single- and
    four-stream with the jump table) / treeless (table reuse across
    blocks), with Huffman weights either direct (4-bit packed) or
    themselves FSE-compressed (two interleaved states on a backward
    bitstream);
  * FSE: the variable-bit probability header (forward bitstream with
    the small-value cutoff and the prob-0 2-bit repeat flags), table
    spread with the (size/2 + size/8 + 3) step and high-cell
    reservation for "less-than-one" symbols, and state-machine
    decoding;
  * sequences: predefined / RLE / FSE-described / repeat modes for the
    literals-length, offset and match-length alphabets, the backward
    interleaved bitstream (init LL→OF→ML, update LL→ML→OF), the
    baseline+extra-bit code tables, and the 3-slot repeated-offset
    history with the literals_length==0 shift rule;
  * sequence execution with overlapping matches.

Verified against genuine production streams: every registered query
payload is produced by pyarrow's bundled libzstd, and the unit tests
roundtrip random/repetitive/structured inputs of all three block
regimes plus the reference xxHash64 vectors.

This is a correctness/portability artifact, not the fast path: for
bulk decode the engine would bind the native library; the value here
is an executable specification the oracle can hash-check end to end.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# xxHash64 (RFC 8878 uses its low 32 bits as the content checksum)
# ---------------------------------------------------------------------------

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _xxh64_merge(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return ((acc * _P64_1) + _P64_4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """Hand-rolled xxHash64 (reference vectors in the unit tests)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i + 32 <= n:
            v1 = _xxh64_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh64_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh64_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh64_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = _xxh64_merge(h, v)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh64_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Backward bitstream (RFC 8878 §3.1.1.3.2.1.1): written forward, read
# from the END; the last byte carries a 1-bit end marker above the
# padding.  Reads below position 0 return zero bits and set `overflow`
# — the FSE interleave relies on detecting exactly that.
# ---------------------------------------------------------------------------


class _BackBits:
    def __init__(self, data: bytes) -> None:
        if not data:
            raise ZstdError("empty backward bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("backward bitstream missing end marker")
        self.data = data
        # total usable bits: everything below the marker bit
        self.pos = 8 * (len(data) - 1) + last.bit_length() - 1
        self.overflow = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        val = 0
        for k in range(n):
            idx = self.pos + k
            if idx < 0:
                self.overflow = True
                continue  # bits below the start read as zero
            val |= ((self.data[idx >> 3] >> (idx & 7)) & 1) << k
        return val


class ZstdError(ValueError):
    pass


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _fse_read_distribution(
    data: bytes, off: int, max_acc: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description (forward bitstream).  Returns
    (probabilities with -1 for less-than-one, accuracy_log, bytes
    consumed)."""

    bitpos = 0

    def read(n: int) -> int:
        nonlocal bitpos
        val = 0
        for k in range(n):
            idx = bitpos + k
            byte = data[off + (idx >> 3)]
            val |= ((byte >> (idx & 7)) & 1) << k
        bitpos += n
        return val

    acc = read(4) + 5
    if acc > max_acc:
        raise ZstdError(f"FSE accuracy_log {acc} exceeds limit {max_acc}")
    size = 1 << acc
    remaining = size + 1
    probs: list[int] = []
    while remaining > 1:
        nb_bits = remaining.bit_length()  # bits for values up to remaining
        threshold = 1 << (nb_bits - 1)
        # values below max_small fit in nb_bits-1 bits; larger values
        # use the full width and fold the reserved range back down
        max_small = (threshold << 1) - 1 - remaining
        low = read(nb_bits - 1)
        if low < max_small:
            value = low
        else:
            hi = read(1)
            value = low + (hi << (nb_bits - 1))
            if value >= threshold:
                value -= max_small
        prob = value - 1  # -1 = less-than-one
        remaining -= abs(prob) if prob < 0 else prob
        probs.append(prob)
        if prob == 0:  # 2-bit repeat flags add more zero-prob symbols
            while True:
                rep = read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return probs, acc, (bitpos + 7) // 8


class _FseTable:
    """Decode table: per state -> (symbol, nb_bits, baseline)."""

    def __init__(self, probs: list[int], acc: int) -> None:
        size = 1 << acc
        self.acc = acc
        symbols = [0] * size
        # less-than-one symbols get one cell each at the table top
        high = size - 1
        for sym, p in enumerate(probs):
            if p == -1:
                symbols[high] = sym
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for sym, p in enumerate(probs):
            if p <= 0:
                continue
            for _ in range(p):
                symbols[pos] = sym
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spread did not complete a cycle")
        counters = [max(p, 1) if p != 0 else 0 for p in probs]
        # cells in table order receive states p..2p-1 per symbol
        next_ix = {s: (1 if probs[s] == -1 else probs[s]) for s in range(len(probs))}
        self.symbol = symbols
        self.nb_bits = [0] * size
        self.baseline = [0] * size
        del counters
        for state in range(size):
            s = symbols[state]
            x = next_ix[s]
            next_ix[s] += 1
            nb = acc - (x.bit_length() - 1)
            self.nb_bits[state] = nb
            self.baseline[state] = (x << nb) - size


def _fse_decompress_interleaved2(
    data: bytes, table: _FseTable, max_out: int
) -> list[int]:
    """Two interleaved FSE states on one backward bitstream (the
    Huffman-weight encoding).  Decodes until the stream is exhausted."""
    bits = _BackBits(data)
    s1 = bits.read(table.acc)
    s2 = bits.read(table.acc)
    out: list[int] = []
    while len(out) < max_out:
        out.append(table.symbol[s1])
        s1 = table.baseline[s1] + bits.read(table.nb_bits[s1])
        if bits.overflow:
            out.append(table.symbol[s2])
            break
        out.append(table.symbol[s2])
        s2 = table.baseline[s2] + bits.read(table.nb_bits[s2])
        if bits.overflow:
            out.append(table.symbol[s1])
            break
    return out


# ---------------------------------------------------------------------------
# Huffman (literals)
# ---------------------------------------------------------------------------


class _HuffTable:
    def __init__(self, weights: list[int]) -> None:
        # implied last weight: total must complete a power of two
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        max_bits = total.bit_length() if total & (total - 1) else total.bit_length()
        target = 1 << max_bits
        if target < total + 1:
            target <<= 1
            max_bits += 1
        left = target - total
        if left & (left - 1):
            raise ZstdError("invalid Huffman weights (non-power-of-2 remainder)")
        weights = weights + [left.bit_length()]
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbol = [0] * size
        self.nb_bits = [0] * size
        # canonical assignment: by weight ascending, then symbol
        pos = 0
        for w in range(1, max_bits + 1):
            for sym, sw in enumerate(weights):
                if sw != w:
                    continue
                count = 1 << (w - 1)
                nb = max_bits + 1 - w
                for _ in range(count):
                    self.symbol[pos] = sym
                    self.nb_bits[pos] = nb
                    pos += 1
        if pos != size:
            raise ZstdError("Huffman table not fully populated")

    def decode_stream(self, data: bytes, n_out: int) -> bytearray:
        bits = _BackBits(data)
        out = bytearray()
        state = bits.read(self.max_bits)
        while len(out) < n_out:
            out.append(self.symbol[state])
            nb = self.nb_bits[state]
            state = ((state << nb) & ((1 << self.max_bits) - 1)) | bits.read(nb)
        return out


def _read_huffman_table(data: bytes, off: int) -> tuple[_HuffTable, int]:
    """Huffman tree description: header byte < 128 -> FSE-compressed
    weights of that many bytes; >= 128 -> (hb - 127) direct 4-bit
    weights.  Returns (table, bytes consumed incl. header)."""
    hb = data[off]
    if hb >= 128:
        n_weights = hb - 127
        n_bytes = (n_weights + 1) // 2
        raw = data[off + 1 : off + 1 + n_bytes]
        weights = []
        for i in range(n_weights):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 15))
        return _HuffTable(weights), 1 + n_bytes
    probs, acc, used = _fse_read_distribution(data, off + 1, 6)
    table = _FseTable(probs, acc)
    stream = data[off + 1 + used : off + 1 + hb]
    weights = _fse_decompress_interleaved2(stream, table, 255)
    return _HuffTable(weights), 1 + hb


# ---------------------------------------------------------------------------
# Sequences: code tables and predefined distributions (RFC 8878 §3.1.1.3.2)
# ---------------------------------------------------------------------------

_LL_BASE = (
    list(range(16))
    + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
       4096, 8192, 16384, 32768, 65536]
)
_LL_BITS = (
    [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                15, 16]
)
_ML_BASE = (
    [m + 3 for m in range(32)]
    + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
       2051, 4099, 8195, 16387, 32771, 65539]
)
_ML_BITS = (
    [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13,
                14, 15, 16]
)
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, -1, -1, -1, -1, -1,
]
_LL_DEFAULT_ACC, _ML_DEFAULT_ACC, _OF_DEFAULT_ACC = 6, 6, 5
_LL_MAX_ACC, _ML_MAX_ACC, _OF_MAX_ACC = 9, 9, 8


def _seq_table(
    mode: int,
    data: bytes,
    off: int,
    default: tuple[list[int], int],
    max_acc: int,
    prev: "_FseTable | None",
    name: str,
) -> tuple[_FseTable, int]:
    """One alphabet's table per its 2-bit compression mode."""
    if mode == 0:  # predefined
        probs, acc = default
        return _FseTable(probs, acc), 0
    if mode == 1:  # RLE: a 1-byte symbol, table with a single 0-bit state
        sym = data[off]
        t = _FseTable.__new__(_FseTable)
        t.acc = 0
        t.symbol = [sym]
        t.nb_bits = [0]
        t.baseline = [0]
        return t, 1
    if mode == 2:  # FSE-described
        probs, acc, used = _fse_read_distribution(data, off, max_acc)
        return _FseTable(probs, acc), used
    if prev is None:  # mode 3: repeat
        raise ZstdError(f"repeat mode for {name} with no previous table")
    return prev, 0


# ---------------------------------------------------------------------------
# The frame decoder
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def zstd_decompress(payload: bytes) -> bytes:
    """Decode one zstandard frame (RFC 8878) from scratch."""
    out, used = _decompress_frame(payload, 0)
    if used != len(payload):
        raise ZstdError(
            f"trailing bytes after frame ({len(payload) - used}); "
            "use zstd_decompress_multi for concatenated frames"
        )
    return out


def _decompress_frame(payload: bytes, start: int) -> tuple[bytes, int]:
    """One frame starting at ``start`` -> (data, bytes consumed)."""
    if payload[start : start + 4] != _ZSTD_MAGIC:
        raise ZstdError("bad zstd frame magic")
    fhd = payload[start + 4]
    i = start + 5
    single_segment = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    dict_flag = fhd & 0x03
    fcs_flag = fhd >> 6
    if fhd & 0x08:
        raise ZstdError("reserved FHD bit set")
    if not single_segment:
        i += 1  # window descriptor (bound, not needed to decode)
    i += (0, 1, 2, 4)[dict_flag]
    fcs = None
    if fcs_flag == 0:
        if single_segment:
            fcs = payload[i]
            i += 1
    elif fcs_flag == 1:
        fcs = int.from_bytes(payload[i : i + 2], "little") + 256
        i += 2
    elif fcs_flag == 2:
        fcs = int.from_bytes(payload[i : i + 4], "little")
        i += 4
    else:
        fcs = int.from_bytes(payload[i : i + 8], "little")
        i += 8

    out = bytearray()
    huff: _HuffTable | None = None
    tables: dict[str, _FseTable | None] = {"ll": None, "of": None, "ml": None}
    rep = [1, 4, 8]

    while True:
        bh = int.from_bytes(payload[i : i + 3], "little")
        i += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:  # raw
            out += payload[i : i + bsize]
            i += bsize
        elif btype == 1:  # RLE
            out += payload[i : i + 1] * bsize
            i += 1
        elif btype == 2:
            huff = _decode_compressed_block(
                payload[i : i + bsize], out, huff, tables, rep
            )
            i += bsize
        else:
            raise ZstdError("reserved block type 3")
        if last:
            break
    if has_checksum:
        (want,) = (int.from_bytes(payload[i : i + 4], "little"),)
        i += 4
        if xxhash64(bytes(out)) & 0xFFFFFFFF != want:
            raise ZstdError("content checksum (xxHash64) mismatch")
    if fcs is not None and len(out) != fcs:
        raise ZstdError(f"decoded {len(out)} bytes, frame declared {fcs}")
    return bytes(out), i - start


def _decode_literals(
    block: bytes, huff: "_HuffTable | None"
) -> tuple[bytes, int, "_HuffTable | None"]:
    """Literals section -> (literals, bytes consumed, huffman table)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            used = 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[1] << 4)
            used = 2
        else:
            rs = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            used = 3
        if ltype == 0:
            return bytes(block[used : used + rs]), used + rs, huff
        return block[used : used + 1] * rs, used + 1, huff
    # compressed (2) or treeless (3)
    if sf == 0:
        n_streams, rbits, hbytes = 1, 10, 3
    elif sf == 1:
        n_streams, rbits, hbytes = 4, 10, 3
    elif sf == 2:
        n_streams, rbits, hbytes = 4, 14, 4
    else:
        n_streams, rbits, hbytes = 4, 18, 5
    v = int.from_bytes(block[:hbytes], "little") >> 4
    rs = v & ((1 << rbits) - 1)
    cs = (v >> rbits) & ((1 << rbits) - 1)
    body = block[hbytes : hbytes + cs]
    off = 0
    if ltype == 2:
        huff, off = _read_huffman_table(body, 0)
    elif huff is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    streams = body[off:]
    if n_streams == 1:
        lit = huff.decode_stream(streams, rs)
    else:
        s1 = int.from_bytes(streams[0:2], "little")
        s2 = int.from_bytes(streams[2:4], "little")
        s3 = int.from_bytes(streams[4:6], "little")
        part = (rs + 3) // 4
        sizes = [s1, s2, s3]
        lit = bytearray()
        pos = 6
        for k in range(4):
            ln = sizes[k] if k < 3 else len(streams) - pos
            n_out = part if k < 3 else rs - 3 * part
            lit += huff.decode_stream(streams[pos : pos + ln], n_out)
            pos += ln
    if len(lit) != rs:
        raise ZstdError("literals length mismatch")
    return bytes(lit), hbytes + cs, huff


def _decode_compressed_block(
    block: bytes,
    out: bytearray,
    huff: "_HuffTable | None",
    tables: dict,
    rep: list[int],
) -> "_HuffTable | None":
    literals, used, huff = _decode_literals(block, huff)
    data = block[used:]
    b0 = data[0]
    if b0 < 128:
        n_seq, off = b0, 1
    elif b0 < 255:
        n_seq, off = ((b0 - 128) << 8) + data[1], 2
    else:
        n_seq, off = int.from_bytes(data[1:3], "little") + 0x7F00, 3
    if n_seq == 0:
        out += literals
        return huff
    scm = data[off]
    off += 1
    if scm & 3:
        raise ZstdError("reserved sequence-compression-mode bits set")
    ll_mode, of_mode, ml_mode = (scm >> 6) & 3, (scm >> 4) & 3, (scm >> 2) & 3
    ll_t, used = _seq_table(
        ll_mode, data, off, (_LL_DEFAULT, _LL_DEFAULT_ACC), _LL_MAX_ACC,
        tables["ll"], "literals-length",
    )
    off += used
    of_t, used = _seq_table(
        of_mode, data, off, (_OF_DEFAULT, _OF_DEFAULT_ACC), _OF_MAX_ACC,
        tables["of"], "offset",
    )
    off += used
    ml_t, used = _seq_table(
        ml_mode, data, off, (_ML_DEFAULT, _ML_DEFAULT_ACC), _ML_MAX_ACC,
        tables["ml"], "match-length",
    )
    off += used
    tables["ll"], tables["of"], tables["ml"] = ll_t, of_t, ml_t

    bits = _BackBits(data[off:])
    ll_s = bits.read(ll_t.acc)
    of_s = bits.read(of_t.acc)
    ml_s = bits.read(ml_t.acc)
    lit_pos = 0
    for seq in range(n_seq):
        of_code = of_t.symbol[of_s]
        if of_code > 31:
            raise ZstdError(f"offset code {of_code} out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_t.symbol[ml_s]
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbol[ll_s]
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeated-offset history
        if offset_value > 3:
            offset = offset_value - 3
            rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[0] - 1 if idx == 3 else rep[idx]
                if idx != 1:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset == 0 or offset > len(out):
            raise ZstdError(f"sequence offset {offset} outside window")
        for _ in range(ml):
            out.append(out[-offset])
        if seq < n_seq - 1:  # final sequence leaves states un-updated
            ll_s = ll_t.baseline[ll_s] + bits.read(ll_t.nb_bits[ll_s])
            ml_s = ml_t.baseline[ml_s] + bits.read(ml_t.nb_bits[ml_s])
            of_s = of_t.baseline[of_s] + bits.read(of_t.nb_bits[of_s])
    out += literals[lit_pos:]
    return huff


_SKIPPABLE_LO, _SKIPPABLE_HI = 0x184D2A50, 0x184D2A5F


def zstd_decompress_multi(payload: bytes) -> bytes:
    """Decode a CONCATENATION of zstd frames (the `.zst` file shape:
    `zstd --rm a b && cat a.zst b.zst` or shard-appended corpora are
    multi-frame), skipping skippable frames (magic 0x184D2A5x, used
    for seek tables and padding) per RFC 8878 §3.1.2."""
    out = bytearray()
    i = 0
    if not payload:
        raise ZstdError("empty zstd payload")
    while i < len(payload):
        magic = int.from_bytes(payload[i : i + 4], "little")
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = int.from_bytes(payload[i + 4 : i + 8], "little")
            i += 8 + size
            continue
        frame, used = _decompress_frame(payload, i)
        out += frame
        i += used
    return bytes(out)
