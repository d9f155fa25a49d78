"""A pure-Python Spark 4 DataSource for Avro Object Container Files.

Spark ships Avro as the EXTERNAL spark-avro module; this sandbox has
no network to fetch the jar, so the format would otherwise be the one
hole in the engine's interchange surface (SURVEY §2.3 — the reference
itself reads only manifest-listed text, `/root/reference/main.c++:
87-98`).  Like the WARC source (warc_source.py), the fix is a Python
DataSource implementing the PUBLIC spec — the Avro 1.11 Object
Container File layout: ``Obj\\x01`` magic, a metadata map carrying the
JSON schema and codec, then sync-marker-delimited blocks of
zigzag-varint-encoded records.

Split model: one InputPartition per ``.avro`` file PLUS byte-range
splits WITHIN files larger than the split size (default 32 MiB) —
the Hadoop AvroInputFormat model: a range reader seeks to its start
offset, resyncs on the 16-byte sync marker, and owns every block that
BEGINS inside its range, so a single multi-GB container file still
fans out across executor cores with no coordination.  Fixture-sized
files get exactly one split, matching the writer below (one container
per write task).

The writer is the inverse: each write task serializes its row
iterator into one container file under the destination directory —
the standard distributed-sink layout.  Codecs: ``null`` and
``deflate`` (stdlib zlib, raw streams) on both sides.

Type coverage is the engine's fixture surface, loudly bounded:
long/int/double/float/string/boolean/bytes, nullable unions, and
arrays thereof.  Anything else raises at schema mapping time rather
than writing a file other readers would misread.

``sources.formats.read_table/write_table`` route ``fmt="avro"``
through this source automatically when the JVM spark-avro module is
absent, so callers are deployment-agnostic.
"""

from __future__ import annotations

import glob
import json
import os
import struct
import sys
import uuid
import zlib
from typing import TYPE_CHECKING, Iterator

from pyspark import cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType

# Python data sources are pickled to executors; ship by value so
# workers need no package install (house pattern, warc_source.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive codecs (Avro spec: zigzag varints, little-endian IEEE floats)
# --------------------------------------------------------------------------


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_long(n: int) -> bytes:
    return _enc_varint((n << 1) ^ (n >> 63))


def _dec_varint(buf, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _dec_long(buf, pos: int) -> tuple[int, int]:
    u, pos = _dec_varint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


# --------------------------------------------------------------------------
# Spark <-> Avro schema mapping (bounded type surface)
# --------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


def _avro_type_of(dt, where: str):
    s = dt.simpleString()
    if s in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[s]
    if s.startswith("array<"):
        return {"type": "array", "items": _avro_type_of(dt.elementType, where)}
    raise TypeError(
        f"avro_py does not map Spark type {s!r} ({where}); supported: "
        f"{sorted(_SPARK_TO_AVRO)} and arrays thereof"
    )


def schema_to_avro_json(schema: "StructType", name: str = "spark_row") -> str:
    fields = []
    for f in schema.fields:
        t = _avro_type_of(f.dataType, f"field {f.name!r}")
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _spark_ddl_of(avro_type, where: str) -> str:
    if isinstance(avro_type, str):
        if avro_type in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[avro_type]
        raise TypeError(f"unsupported avro type {avro_type!r} ({where})")
    if isinstance(avro_type, list):  # union — only ["null", T] supported
        non_null = [t for t in avro_type if t != "null"]
        if len(non_null) != 1:
            raise TypeError(f"unsupported avro union {avro_type!r} ({where})")
        return _spark_ddl_of(non_null[0], where)
    if isinstance(avro_type, dict) and avro_type.get("type") == "array":
        return f"array<{_spark_ddl_of(avro_type['items'], where)}>"
    raise TypeError(f"unsupported avro type {avro_type!r} ({where})")


def avro_json_to_spark_ddl(schema_json: str) -> str:
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise TypeError("avro_py reads record-schema container files only")
    cols = []
    for f in sch["fields"]:
        ddl = _spark_ddl_of(f["type"], "field " + repr(f["name"]))
        cols.append(f"{f['name']} {ddl}")
    return ", ".join(cols)


# --------------------------------------------------------------------------
# value codecs driven by the (parsed) avro schema
# --------------------------------------------------------------------------


def _encode_value(avro_type, v) -> bytes:
    if isinstance(avro_type, list):  # nullable union
        if v is None:
            return _enc_long(0)
        non_null = next(t for t in avro_type if t != "null")
        return _enc_long(avro_type.index(non_null)) + _encode_value(non_null, v)
    if isinstance(avro_type, dict):  # array
        if v is None:
            raise ValueError("None in non-nullable avro array field")
        items = avro_type["items"]
        if len(v) == 0:
            return _enc_long(0)
        body = b"".join(_encode_value(items, x) for x in v)
        return _enc_long(len(v)) + body + _enc_long(0)
    if avro_type == "long" or avro_type == "int":
        return _enc_long(int(v))
    if avro_type == "double":
        return struct.pack("<d", float(v))
    if avro_type == "float":
        return struct.pack("<f", float(v))
    if avro_type == "string":
        raw = str(v).encode("utf-8")
        return _enc_long(len(raw)) + raw
    if avro_type == "boolean":
        return b"\x01" if v else b"\x00"
    if avro_type == "bytes":
        raw = bytes(v)
        return _enc_long(len(raw)) + raw
    raise TypeError(f"unsupported avro type {avro_type!r}")


def _decode_value(avro_type, buf, pos: int):
    if isinstance(avro_type, list):
        idx, pos = _dec_long(buf, pos)
        branch = avro_type[idx]
        if branch == "null":
            return None, pos
        return _decode_value(branch, buf, pos)
    if isinstance(avro_type, dict):
        items = avro_type["items"]
        out = []
        while True:
            n, pos = _dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with explicit byte size (spec-legal)
                n = -n
                _, pos = _dec_long(buf, pos)
            for _ in range(n):
                v, pos = _decode_value(items, buf, pos)
                out.append(v)
    if avro_type == "long" or avro_type == "int":
        return _dec_long(buf, pos)
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if avro_type == "string":
        n, pos = _dec_long(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if avro_type == "boolean":
        return buf[pos] == 1, pos + 1
    if avro_type == "bytes":
        n, pos = _dec_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise TypeError(f"unsupported avro type {avro_type!r}")


# --------------------------------------------------------------------------
# container file read/write
# --------------------------------------------------------------------------


def write_container(
    path: str,
    schema_json: str,
    rows: Iterator,
    codec: str = "deflate",
    block_bytes: int = 4 * 1024 * 1024,
) -> int:
    """Serialize ``rows`` (sequences in field order) into one OCF at
    ``path``; returns the record count.  One block per ~4 MiB of
    encoded payload — block-per-file would defeat future per-block
    splitting; block-per-row would pay the sync marker 16x per row.
    Blocks stream to disk as they fill, so peak memory is one encoded
    block (~4 MiB), never the whole container — a write task over a
    large partition must not buffer its full output in executor RAM."""
    sch = json.loads(schema_json)
    field_types = [f["type"] for f in sch["fields"]]
    sync = uuid.uuid5(uuid.NAMESPACE_URL, path).bytes  # deterministic
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    total = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(_enc_long(len(meta)))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            fh.write(_enc_long(len(kb)) + kb + _enc_long(len(v)) + v)
        fh.write(_enc_long(0))
        fh.write(sync)

        def flush(buf: bytearray, n: int) -> None:
            payload = bytes(buf)
            if codec == "deflate":
                co = zlib.compressobj(wbits=-15)  # raw stream per spec
                payload = co.compress(payload) + co.flush()
            fh.write(_enc_long(n) + _enc_long(len(payload)) + payload + sync)

        block = bytearray()
        n_in_block = 0
        for row in rows:
            for t, v in zip(field_types, row):
                block += _encode_value(t, v)
            n_in_block += 1
            total += 1
            if len(block) >= block_bytes:
                flush(block, n_in_block)
                block, n_in_block = bytearray(), 0
        if n_in_block:
            flush(block, n_in_block)
    return total


class _NeedMore(Exception):
    """Header parse ran off the end of the buffered prefix."""


def _parse_header(head: bytes, path: str) -> tuple[str, str, bytes, int]:
    if len(head) < 4:
        raise _NeedMore
    if head[:4] != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")

    def take(pos: int, n: int) -> bytes:
        if pos + n > len(head):
            raise _NeedMore
        return head[pos : pos + n]

    pos = 4
    meta: dict[str, bytes] = {}
    try:
        while True:
            n, pos = _dec_long(head, pos)
            if n == 0:
                break
            if n < 0:  # block with byte size
                n = -n
                _, pos = _dec_long(head, pos)
            for _ in range(n):
                klen, pos = _dec_long(head, pos)
                k = take(pos, klen).decode("utf-8")
                pos += klen
                vlen, pos = _dec_long(head, pos)
                meta[k] = bytes(take(pos, vlen))
                pos += vlen
    except IndexError:  # varint decode ran past the buffered prefix
        raise _NeedMore from None
    sync = bytes(take(pos, 16))
    pos += 16
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return meta["avro.schema"].decode("utf-8"), codec, sync, pos


def read_header(path: str) -> tuple[str, str, bytes, int]:
    """(schema_json, codec, sync, first_block_pos) of one OCF.

    Incremental: reads a 64 KiB prefix and doubles on demand until the
    metadata map and sync marker decode — never the whole file.  This
    is called once per file at planning time AND once per byte-range
    split at read time, so on a multi-GB container (the exact case
    range splits exist for) a full-file slurp here would read the
    container O(n_splits) times and hold it in RAM."""
    with open(path, "rb") as fh:
        head = fh.read(64 * 1024)
        while True:
            try:
                return _parse_header(head, path)
            except _NeedMore:
                more = fh.read(len(head))  # geometric growth
                if not more:
                    raise ValueError(f"{path}: truncated avro header")
                head += more


def read_range(
    path: str, start: int | None = None, end: int | None = None
) -> Iterator[tuple]:
    """Decode the blocks that BEGIN in ``[start, end)`` of one OCF —
    the split-ownership rule that makes byte-range partitioning
    lossless and disjoint (Hadoop's AvroInputFormat): a reader whose
    range opens mid-block resyncs forward on the 16-byte sync marker,
    and a block straddling ``end`` still belongs to the range that
    contains its first byte.  ``start=None`` means the first block
    (no resync scan)."""
    schema_json, codec, sync, first = read_header(path)
    sch = json.loads(schema_json)
    field_types = [f["type"] for f in sch["fields"]]
    size = os.path.getsize(path)
    if end is None:
        end = size
    with open(path, "rb") as fh:
        # growable window [base, base+len(buf)) — a range reads only
        # its own bytes plus whatever its last (possibly straddling)
        # block needs, never the whole file
        base = first if (start is None or start <= first) else start - 16
        fh.seek(base)
        buf = fh.read(max(end - base, 0) + 16)

        def ensure(upto_abs: int) -> None:
            nonlocal buf
            need = upto_abs - base - len(buf)
            if need > 0:
                buf += fh.read(need)

        if start is None or start <= first:
            pos = first
        else:
            # resync: a block begins immediately after a sync marker;
            # searching from start-16 means a sync ENDING exactly at
            # start is found, so the block starting at start belongs
            # to this range.  (A random 16-byte payload collision with
            # the marker would misalign the scan — the standard
            # 2^-128 risk every Avro splitter accepts.)
            hit = buf.find(sync)
            if hit < 0 or base + hit + 16 >= end:
                return
            pos = base + hit + 16
        while pos < end and pos < size:
            ensure(pos + 20)
            n_records, p2 = _dec_long(buf, pos - base)
            n_bytes, p2 = _dec_long(buf, p2)
            block_end = base + p2 + n_bytes + 16
            ensure(block_end)
            payload = buf[p2 : p2 + n_bytes]
            if buf[p2 + n_bytes : p2 + n_bytes + 16] != sync:
                raise ValueError(f"{path}: sync marker mismatch at {base + p2 + n_bytes}")
            pos = block_end
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            elif codec != "null":
                raise ValueError(f"{path}: unsupported avro codec {codec!r}")
            p = 0
            for _ in range(n_records):
                row = []
                for t in field_types:
                    v, p = _decode_value(t, payload, p)
                    row.append(v)
                yield tuple(row)
            if p != len(payload):
                raise ValueError(
                    f"{path}: {len(payload) - p} trailing block bytes"
                )


def read_container(path: str) -> Iterator[tuple]:
    yield from read_range(path)


# --------------------------------------------------------------------------
# the DataSource
# --------------------------------------------------------------------------


class AvroFilePartition(InputPartition):
    def __init__(self, path: str, start: int | None = None, end: int | None = None) -> None:
        self.path = path
        self.start = start
        self.end = end


class AvroReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("avro_py source requires .option('path', dir)")
        self.dir = path
        self.split_bytes = int(
            float(options.get("split_mib", "32")) * (1 << 20)
        )

    def partitions(self):
        """One split per file, plus byte-range splits inside files
        larger than ``split_mib`` — each range reader resyncs on the
        sync marker and owns the blocks that begin in its range, so a
        single huge container still fans out (the 100 TB shape).  The
        per-file header read here is driver-side but bounded: one
        small read per file, no data scan."""
        files = sorted(glob.glob(os.path.join(self.dir, "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.dir}")
        parts: list[AvroFilePartition] = []
        for p in files:
            size = os.path.getsize(p)
            _schema, _codec, _sync, first = read_header(p)
            if size - first <= self.split_bytes:
                parts.append(AvroFilePartition(p))
                continue
            lo = first
            while lo < size:
                hi = min(lo + self.split_bytes, size)
                parts.append(
                    AvroFilePartition(p, None if lo == first else lo, hi)
                )
                lo = hi
        return parts

    def read(self, partition: AvroFilePartition):
        yield from read_range(partition.path, partition.start, partition.end)


class AvroCommitMessage(WriterCommitMessage):
    def __init__(self, file: str, n: int) -> None:
        self.file = file  # staging path (.avro.tmp-<attempt>)
        self.n = n


class AvroWriter(DataSourceWriter):
    """One container file per write task under the destination dir —
    the distributed-sink layout (no driver funnel; each task owns its
    shard, exactly like parquet's part files).

    Task-commit protocol: each task attempt writes to a staging name
    (``*.avro.tmp-<attempt>``) the reader's ``*.avro`` glob never
    matches; ``commit()`` renames exactly the files named in the
    commit messages to their final ``.avro`` name and sweeps any
    orphaned staging files (failed / speculatively-retried attempts
    that wrote before dying), so a lost task can never leave a shard
    that is read back twice."""

    def __init__(self, options: dict, schema_json: str) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("avro_py sink requires .option('path', dir)")
        self.dir = path
        self.schema_json = schema_json

    def write(self, iterator: Iterator) -> AvroCommitMessage:
        os.makedirs(self.dir, exist_ok=True)
        attempt = uuid.uuid4().hex
        staged = os.path.join(self.dir, f"part-{attempt}.avro.tmp-{attempt}")
        n = write_container(staged, self.schema_json, (tuple(r) for r in iterator))
        return AvroCommitMessage(staged, n)

    def commit(self, messages) -> None:
        committed = set()
        for m in messages:
            if m is None:
                continue
            final = m.file.split(".avro.tmp-")[0] + ".avro"
            os.replace(m.file, final)
            committed.add(final)
        # sweep staging files from attempts that never reached commit
        for orphan in glob.glob(os.path.join(self.dir, "*.avro.tmp-*")):
            os.remove(orphan)

    def abort(self, messages) -> None:
        for orphan in glob.glob(os.path.join(self.dir, "*.avro.tmp-*")):
            os.remove(orphan)


class AvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        # self-describing: the planning-time schema comes from the
        # first container file's header (a bounded driver-side read of
        # one header, not a data scan)
        files = sorted(glob.glob(os.path.join(self.options["path"], "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.options['path']}")
        schema_json, _codec, _sync, _pos = read_header(files[0])
        return avro_json_to_spark_ddl(schema_json)

    def reader(self, schema: "StructType") -> AvroReader:
        return AvroReader(self.options)

    def writer(self, schema: "StructType", overwrite: bool) -> AvroWriter:
        if overwrite:
            for p in glob.glob(os.path.join(self.options["path"], "*.avro")):
                os.remove(p)
        return AvroWriter(self.options, schema_to_avro_json(schema))
