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
