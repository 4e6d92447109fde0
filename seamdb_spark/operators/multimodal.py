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


# Hex-parse of the first TWO md5 chars (== digest[0]) as DuckDB SQL.
_HEXD = "0123456789abcdef"
_MD5_BYTE0_SQL = (
    f"((strpos('{_HEXD}', substr(md5(text), 1, 1)) - 1) * 16"
    f" + strpos('{_HEXD}', substr(md5(text), 2, 1)) - 1)"
)


# --------------------------------------------------------------------------
# Feature extraction with stubbed decode.
#
# Oracle-checked: fake_decode is md5-derived, so DuckDB can recompute
# every feature in SQL (hex-parse the digest bytes). feat_mean is the
# RAW quotient bytesum/4080.0 — an integer divided by an exactly
# representable constant is one IEEE op, bit-identical across engines,
# with no round() semantics to reconcile.
# --------------------------------------------------------------------------
def _m02_oracle() -> str:
    byte_val = (
        f"(strpos('{_HEXD}', substr(hx, 2 * i + 1, 1)) - 1) * 16"
        f" + strpos('{_HEXD}', substr(hx, 2 * i + 2, 1)) - 1"
    )
    return f"""
    WITH h AS (SELECT doc_id, text, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, text, hx, SUM({byte_val}) AS bytesum
      FROM h, (SELECT unnest(range(0, 16)) AS i)
      GROUP BY doc_id, text, hx
    )
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(1 + {_MD5_BYTE0_SQL} % 8 AS BIGINT)         AS n_frames,
           bytesum / (16 * 255.0)                           AS feat_mean,
           CAST(16 AS BIGINT)                               AS feat_dim
    FROM b
    """


@register("m02_media_features", oracle=_m02_oracle())
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
                    "feat_mean": decoded.map(lambda d: d["feat_mean"]),
                    "feat_dim": decoded.map(lambda d: d["feat_dim"]).astype("int64"),
                }
            )

    return payloads.mapInPandas(featurize, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_checksum string"


# --------------------------------------------------------------------------
# Frame sampling: 1 media row → N sampled-frame rows via mapInPandas.
#
# The video-pipeline shape: decode frame count, keep every 2nd frame,
# emit one row per kept frame. Demonstrates a batch-shape-changing
# Pandas UDF (output row count differs from input) with zero shuffle —
# sampling is payload-local, so it scales linearly with input bytes.
# The frame count and per-frame checksum derive deterministically from
# the payload (decode itself is the stubbed step, as in m02), which
# makes the whole explode oracle-checkable in SQL.
# --------------------------------------------------------------------------
@register(
    "m03_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, 1 + {_MD5_BYTE0_SQL} % 8 AS n_frames
      FROM documents
    ),
    x AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
      FROM f
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_checksum
    FROM x
    """,
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _with_payload(spark, sf_dir)

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = 1 + hashlib.md5(raw).digest()[0] % 8
                for idx in range(0, n_frames, 2):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_checksum"].append(
                        hashlib.md5(raw + b":" + str(idx).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Image resize / thumbnailing plumbing (decode stubbed, as in m02/m03).
#
# The image-pipeline stage between decode and feature-extract: read
# source dimensions, downscale so the longest side is <= MAX_SIDE
# preserving aspect ratio (integer floor division — exact in both
# engines), emit the resized-artifact checksum. The real decoder/PIL
# resize is the stubbed step (no codecs in this container); the
# dimensions derive deterministically from md5 digest bytes so the
# whole stage is oracle-checkable, while the Spark-side plumbing
# (binary column in, Arrow-batched mapInPandas, one row out per image,
# zero shuffle) is exactly the production shape.
# --------------------------------------------------------------------------
MAX_SIDE = 256
RESIZE_SCHEMA = (
    "doc_id long, width long, height long, thumb_w long, thumb_h long,"
    " thumb_checksum string"
)


def _md5_byte_sql(k: int) -> str:
    """DuckDB SQL for md5(text) digest byte k (0-indexed)."""
    return (
        f"((strpos('{_HEXD}', substr(md5(text), {2 * k + 1}, 1)) - 1) * 16"
        f" + strpos('{_HEXD}', substr(md5(text), {2 * k + 2}, 1)) - 1)"
    )


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for reading image dimensions (32..2072 px)."""
    digest = hashlib.md5(payload).digest()
    return 32 + digest[1] * 8, 32 + digest[2] * 8


@register(
    "m04_image_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, text,
             32 + {_md5_byte_sql(1)} * 8 AS width,
             32 + {_md5_byte_sql(2)} * 8 AS height
      FROM documents
    ),
    t AS (
      SELECT doc_id, text, width, height,
             CASE WHEN GREATEST(width, height) <= {MAX_SIDE} THEN width
                  ELSE (width * {MAX_SIDE}) // GREATEST(width, height) END AS thumb_w,
             CASE WHEN GREATEST(width, height) <= {MAX_SIDE} THEN height
                  ELSE (height * {MAX_SIDE}) // GREATEST(width, height) END AS thumb_h
      FROM dims
    )
    SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
           CAST(thumb_w AS BIGINT) AS thumb_w, CAST(thumb_h AS BIGINT) AS thumb_h,
           md5(text || ':' || CAST(thumb_w AS VARCHAR) || 'x'
                    || CAST(thumb_h AS VARCHAR)) AS thumb_checksum
    FROM t
    """,
)
def m04_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _with_payload(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "thumb_w": [], "thumb_h": [], "thumb_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h = fake_decode_dims(raw)
                mx = max(w, h)
                tw, th = (w, h) if mx <= MAX_SIDE else (
                    w * MAX_SIDE // mx, h * MAX_SIDE // mx
                )
                # decode_media(raw) + PIL .resize((tw, th)) is the real
                # path; the checksum stands in for the resized bytes.
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["thumb_w"].append(tw)
                out["thumb_h"].append(th)
                out["thumb_checksum"].append(
                    hashlib.md5(raw + f":{tw}x{th}".encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(resize, schema=RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# m05: binary windowing — fixed-size byte windows with 50% hop over the
# opaque payload (the audio-pipeline analogue of t17's token chunking:
# frame extraction for feature models operates on exactly this shape).
# The mapInPandas kernel explodes 1→N rows batch-wise; the oracle
# replays the same byte slicing with BLOB substring + md5 in SQL, so
# the binary-domain plumbing (offsets, short final window, digests) is
# hash-checked end-to-end.
#
# Scale: row-local explode, zero shuffle; output rows ~ payload_bytes /
# hop. Window/hop are the batch-memory knobs at 100 TB.
# --------------------------------------------------------------------------
WINDOW_BYTES = 64
WINDOW_HOP = 32
WINDOW_SCHEMA = (
    "doc_id long, window_id long, byte_off long, n_bytes long, window_md5 string"
)


@register(
    "m05_binary_windows",
    oracle=f"""
    -- DuckDB's substring is VARCHAR-only; the synthesized payload is
    -- the ASCII utf-8 of `text`, so character slicing is byte-identical
    -- (1 byte per char) and md5(str) == md5(bytes).
    WITH sized AS (
      SELECT doc_id, text AS payload, octet_length(CAST(text AS BLOB)) AS n
      FROM documents
    ),
    idx AS (
      SELECT doc_id, payload, n,
             UNNEST(generate_series(0,
               CAST(CEIL(GREATEST(n - {WINDOW_BYTES}, 0) / {WINDOW_HOP}.0)
                    AS BIGINT))) AS k
      FROM sized
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS window_id,
           CAST(k * {WINDOW_HOP} + 1 AS BIGINT) AS byte_off,
           CAST(length(substring(payload, k * {WINDOW_HOP} + 1,
                                 {WINDOW_BYTES})) AS BIGINT) AS n_bytes,
           md5(substring(payload, k * {WINDOW_HOP} + 1, {WINDOW_BYTES}))
             AS window_md5
    FROM idx
    """,
)
def m05_binary_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = _with_payload(spark, sf_dir)

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wids, offs, lens, digests = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                n_windows = 1 + max(0, -(-max(0, n - WINDOW_BYTES) // WINDOW_HOP))
                for k in range(n_windows):
                    start = k * WINDOW_HOP
                    piece = data[start : start + WINDOW_BYTES]
                    ids.append(doc_id)
                    wids.append(k)
                    offs.append(start + 1)
                    lens.append(len(piece))
                    digests.append(hashlib.md5(piece).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "window_id": pd.array(wids, dtype="int64"),
                    "byte_off": pd.array(offs, dtype="int64"),
                    "n_bytes": pd.array(lens, dtype="int64"),
                    "window_md5": pd.array(digests, dtype="string"),
                }
            )

    return payloads.mapInPandas(windows, schema=WINDOW_SCHEMA)
