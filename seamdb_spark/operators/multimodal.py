"""Multimodal column plumbing (beyond-reference extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The container has no decode libraries, so the decode step is a
clearly-marked deterministic stub — but the Spark-side plumbing is real:
binary column synthesis, Arrow-batched ``mapInPandas`` with an explicit
output schema, and partition-preserving flow (no driver collect).

``m01_binary_metadata`` has a DuckDB oracle because its outputs
(byte length, md5 digest, declared content type) are computable from the
source text in SQL; the Pandas-UDF path must agree with it exactly —
that checks the UDF plumbing end-to-end, not just a stub.

Scale notes (100 TB): binary payloads dominate row size → keep
``maxPartitionBytes`` small enough that a batch of rows fits executor
memory; mapInPandas streams Arrow batches, never materializing a
partition. Feature extraction parallelizes per-batch with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

DECODE_SCHEMA = "doc_id long, n_bytes long, checksum string, content_type string"
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, n_frames long, feat_mean double, feat_dim long"
)


def decode_media(payload: bytes) -> dict:
    """STUB: real decode (image/audio/video) requires codec libraries not
    present in this container. Raises to make the boundary explicit;
    callers use :func:`fake_decode` for deterministic tests."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not installed; "
        "use fake_decode for the deterministic test path"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo 'frames' and a
    'feature' from the payload bytes. Same shape a real decoder returns."""
    digest = hashlib.md5(payload).digest()
    n_frames = 1 + digest[0] % 8
    feat_mean = sum(digest) / (len(digest) * 255.0)
    return {"n_frames": n_frames, "feat_mean": feat_mean, "feat_dim": 16}


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload column (utf-8 bytes of text
    stand in for a media blob; at production the column arrives binary)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("content_type"),
    )


# --------------------------------------------------------------------------
# Binary metadata extraction via mapInPandas (Arrow-batched)
# --------------------------------------------------------------------------
@register(
    "m01_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text)                                        AS checksum,
           'text/plain'                                     AS content_type
    FROM documents
    """,
)
def m01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _with_payload(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "content_type": pdf["content_type"],
                }
            )

    return payloads.mapInPandas(extract, schema=DECODE_SCHEMA)


# --------------------------------------------------------------------------
# Feature extraction with stubbed decode (rows-only driver check)
# --------------------------------------------------------------------------
@register("m02_media_features")
def m02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _with_payload(spark, sf_dir)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "n_frames": decoded.map(lambda d: d["n_frames"]).astype("int64"),
                    "feat_mean": decoded.map(lambda d: round(d["feat_mean"], 6)),
                    "feat_dim": decoded.map(lambda d: d["feat_dim"]).astype("int64"),
                }
            )

    return payloads.mapInPandas(featurize, schema=FEATURE_SCHEMA)
