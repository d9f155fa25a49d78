"""Multimodal-column plumbing (north-star, SURVEY.md §2.3).

Treats media as opaque ``binary`` payload columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` — the pattern a 100 TB
image/audio pipeline uses (decode / resize / frame-sample per batch on
executors, no driver involvement, no row-at-a-time Python).

The container has no image/audio libraries, so the real decoder is
stubbed (import-gated, raises ``NotImplementedError``) and the default
path computes DETERMINISTIC fake features from the payload bytes.  The
Spark-side plumbing — binary schema, Arrow batch iteration, UDF
signature, partition-parallel execution — is real and oracle-checked.

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


def real_decode(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Actual image decode -- only valid when PIL is installed."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; this environment ships none -- "
            "the deterministic fake path below is used instead"
        )
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as im:
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
