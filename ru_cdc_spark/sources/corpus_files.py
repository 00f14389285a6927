"""Compressed-JSONL corpus shards (.jsonl.zst / .jsonl.gz) — the file
format the big open corpora actually ship in (Dolma, The Pile, RedPajama
publish newline-delimited JSON compressed with zstd or gzip, one shard
per a few hundred MB).

Spark reads .jsonl.gz natively (Hadoop's gzip codec), but .jsonl.zst
needs a zstd codec the stock classpath lacks — this module covers both
through one path: binaryFile (one task per shard, the published
layout's parallelism), codec sniffed from magic bytes, zstd inflated by
functions/zstd.py (full RFC 8878 — any conformant frame, incl.
multi-frame shards and skippable frames real writers emit), then
Spark's own from_json does the JSON work JVM-side.

Scale shape: shards stay whole-file units (compressed JSONL is not
splittable — the same constraint every engine has), so parallelism =
shard count, which the publishers size for exactly this reason;
payload bytes never touch the driver.
"""

from __future__ import annotations

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
GZIP_MAGIC = b"\x1f\x8b"

JSONL_RAW_DDL = "shard string, line string"


def decompress_shard(blob: bytes) -> bytes:
    """Codec by magic: zstd (RFC 8878 — multi-frame concatenation is
    legal and real writers emit it), gzip (multi-member likewise), or
    plain bytes."""
    if blob[:4] == ZSTD_MAGIC or blob[:2] == b"\x50\x2a":
        from ru_cdc_spark.functions.zstd import decompress

        return decompress(blob)
    if blob[:2] == GZIP_MAGIC:
        # multi-member gzip: walk members like the WARC reader
        from ru_cdc_spark.sources.warc import iter_warc_gz_members

        return b"".join(iter_warc_gz_members(blob))
    return blob


def read_jsonl_lines(spark, path_glob: str):
    """Shards -> (shard, line) rows: one task per shard file inflates
    and splits lines executor-side; JSON parsing is left to Spark's
    from_json (JVM-side, schema-checked) so the Python layer moves
    bytes, not objects."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def split_lines(batches):
        for pdf in batches:
            shards, lines = [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                text = decompress_shard(bytes(blob)).decode("utf-8")
                for line in text.split("\n"):
                    if line.strip():
                        shards.append(name)
                        lines.append(line)
            yield pd.DataFrame({"shard": shards, "line": lines})

    return files.mapInPandas(split_lines, JSONL_RAW_DDL)


def read_jsonl(spark, path_glob: str, schema_ddl: str):
    """Typed corpus read: inflate + line-split in Python, parse + type
    with Spark's from_json — malformed lines surface as NULL structs
    (filterable), exactly Spark's native JSON permissive mode."""
    from pyspark.sql import functions as F

    lines = read_jsonl_lines(spark, path_glob)
    return (lines
            .select("shard",
                    F.from_json("line", schema_ddl).alias("r"))
            .select("shard", "r.*"))


def write_jsonl_shards(df, out_dir: str, codec: str = "zstd",
                       n_shards: int = 8) -> int:
    """Package a DataFrame into .jsonl.<codec> shards executor-side
    (to_json per row, one compressed shard per partition; zstd via
    pyarrow's libzstd when importable — which cross-validates the spec
    decoder against a reference compressor — else the spec encoder).
    ``codec="zstd-spec"`` forces the in-repo RFC 8878 compressing
    encoder regardless of pyarrow — the no-dependency path, proven by
    the roundtrip query. Returns the row count written. Driver
    materializes ONE count row per shard, nothing else."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    ext = {"zstd": "zst", "zstd-spec": "zst",
           "gzip": "gz", "none": "jsonl"}[codec]
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("j"))

    def write_shard(batches):
        from pyspark import TaskContext

        rows = []
        for pdf in batches:
            rows.extend(pdf["j"].tolist())
        if rows:
            raw = ("\n".join(rows) + "\n").encode()
            if codec == "zstd-spec":
                from ru_cdc_spark.functions.zstd import compress

                blob = compress(raw)
            elif codec == "zstd":
                try:
                    import pyarrow as _pa

                    blob = _pa.Codec("zstd").compress(raw).to_pybytes()
                except ImportError:
                    from ru_cdc_spark.functions.zstd import compress

                    blob = compress(raw)
            elif codec == "gzip":
                import gzip as _gz

                blob = _gz.compress(raw, mtime=0)
            else:
                blob = raw
            pid = TaskContext.get().partitionId()
            path = os.path.join(out_dir, f"shard{pid:05d}.jsonl.{ext}")
            with open(path, "wb") as f:
                f.write(blob)
        yield pd.DataFrame({"n": pd.Series([len(rows)], dtype="int64")})

    counts = payload.repartition(n_shards) \
        .mapInPandas(write_shard, "n long").collect()
    return sum(r.n for r in counts)
