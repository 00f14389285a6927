"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, byte length, content hash). The decode /
feature-extract step is a Pandas-UDF batch operator over ``mapInPandas`` —
the real Spark-side plumbing (schema, Arrow batching, partition-parallel
execution) with the codec itself STUBBED: the container has no image/audio
libraries, so ``decode_payload`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested (tests use the fake).

Scale: binary payloads stream through Arrow record batches; metadata-only
transforms never touch the payload bytes (column pruning drops them at the
scan when the query doesn't reference the column).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table

DECODED_SCHEMA = (
    "doc_id long, modality string, byte_len int, sha string, "
    "width int, height int, n_frames int"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize a binary column + metadata struct from the documents
    table (stand-in for real image/audio bytes; deterministic)."""
    payload = F.encode(F.col("text"), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.octet_length(payload).alias("byte_len"),
            F.md5(payload).alias("sha"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> dict:
    """STUB codec. Real decode (PIL/librosa/ffmpeg) is unavailable in this
    container; ``fake=True`` yields a deterministic pseudo-decode derived
    from the payload hash so the distributed plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    h = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return {
        "width": 64 + h % 1024,
        "height": 64 + (h >> 10) % 1024,
        "n_frames": 1 if modality == "image" else 1 + h % 300,
    }


def decode_features(docs_with_payload: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas batch decoder: Arrow batches in, decoded metadata out.

    Scale: runs partition-parallel; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch. The payload column is
    dropped on output so downstream stages shuffle only metadata.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_payload(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "byte_len": pdf["byte_len"].values,
                "sha": pdf["sha"].values,
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
                "n_frames": [d["n_frames"] for d in decoded],
            })
            yield out

    flat = docs_with_payload.select(
        "doc_id", "payload",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha").alias("sha"),
    )
    return flat.mapInPandas(op, schema=DECODED_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query over the multimodal table: per-modality byte
    stats + content hashes — never touches payload bytes downstream of the
    projection (oracle-checkable: hashes/lengths are deterministic)."""
    with_payload = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return with_payload.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha").alias("sha"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS modality,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS sha
FROM documents
"""


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mapInPandas decode pipeline with the deterministic fake
    codec (rows-only oracle: mapInPandas is not SQL-expressible)."""
    with_payload = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_features(with_payload, fake=True)


FRAME_SCHEMA = (
    "doc_id long, modality string, frame_idx int, byte_offset long, "
    "frame_sha string"
)


def frame_sample(docs_with_payload: DataFrame) -> DataFrame:
    """Frame sampling: the 1 -> N expanding mapInPandas shape (one input
    row yields a variable number of frame rows). A real implementation
    seeks the container format at each offset and decodes (ffmpeg —
    unavailable here); the sampling *plan* is real and deterministic:
    k frames per clip (1 for still images), evenly spaced byte offsets,
    and a per-frame content fingerprint.

    Scale: expansion happens inside Arrow batches — no explode shuffle,
    no driver involvement; output batches are bounded by input batch size
    x max frames. Payload bytes never leave the executor: only offsets
    and hashes ship downstream.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "modality": [], "frame_idx": [],
                "byte_offset": [], "frame_sha": [],
            }
            for doc_id, modality, byte_len, sha in zip(
                pdf["doc_id"], pdf["modality"], pdf["byte_len"], pdf["sha"]
            ):
                k = 1 if modality == "image" else 1 + int(byte_len) % 4
                for i in range(k):
                    off = (i * int(byte_len)) // k
                    out["doc_id"].append(doc_id)
                    out["modality"].append(modality)
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_sha"].append(
                        hashlib.md5(f"{sha}:{off}".encode()).hexdigest())
            yield pd.DataFrame(out)

    flat = docs_with_payload.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha").alias("sha"),
    )
    return flat.mapInPandas(op, schema=FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling query over the multimodal table (deterministic fake
    sampler => full SQL oracle despite the mapInPandas execution)."""
    with_payload = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return frame_sample(with_payload)


MULTIMODAL_FRAME_SAMPLE_SQL = """
WITH m AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS modality,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS sha
    FROM documents
), f AS (
    SELECT *, CASE WHEN modality = 'image' THEN 1 ELSE 1 + byte_len % 4 END AS k
    FROM m
)
SELECT doc_id, modality, CAST(gs.i AS INT) AS frame_idx,
       CAST((gs.i * byte_len) // k AS BIGINT) AS byte_offset,
       md5(sha || ':' || CAST((gs.i * byte_len) // k AS VARCHAR)) AS frame_sha
FROM f CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) gs
WHERE gs.i < k
"""
