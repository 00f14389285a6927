"""Streaming change-data-feed source over the log-structured ACID
table — Delta CDF's ``readStream`` contract on the in-repo table
format (operators/acid_table.py).

Offsets are TABLE VERSIONS: ``latestOffset`` replays the commit log
(driver-side metadata, pure filesystem), and every micro-batch delivers
the row-level changes of versions ``(start, end]`` — one ``insert`` /
``delete`` per appeared/vanished PK and an ``update_preimage`` +
``update_postimage`` pair per changed PK, each stamped with its commit
version. Downstream consumers (search indexes, caches, feature stores)
follow the materialized table without re-diffing snapshots.

Scale shape: a commit's change set lives entirely in the files it
ADDED or REMOVED (copy-on-write: untouched files cannot contribute a
change), so ``read`` opens only those files — cost is O(micro-batch
write volume), never O(table). Executors read parquet via pyarrow
directly (a DataSource ``read`` runs without a SparkSession); the
pk-hash ``bucket`` partitioning spreads the diff work across tasks,
each loading only the changed files and keeping only its bucket's
keys.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_ARROW_TO_DDL = {
    "int64": "long", "int32": "int", "double": "double",
    "float": "float", "string": "string", "large_string": "string",
    "bool": "boolean", "binary": "binary", "large_binary": "binary",
    "date32[day]": "date",
}


def _ddl_of_arrow(t) -> str:
    s = str(t)
    if s in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[s]
    if s.startswith("timestamp"):
        return "timestamp_ntz" if "tz=" not in s else "timestamp"
    if s.startswith("decimal128("):
        return "decimal" + s[len("decimal128"):]
    raise ValueError(f"unsupported arrow type {s} in CDF source")


def _bucket_of(value) -> int:
    return int.from_bytes(
        hashlib.md5(str(value).encode()).digest()[:4], "big")


class _CdfPartition(InputPartition):
    def __init__(self, from_v: int, to_v: int, bucket: int,
                 n_buckets: int) -> None:
        self.from_v = from_v
        self.to_v = to_v
        self.bucket = bucket
        self.n_buckets = n_buckets


class AcidCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_names: list[str]) -> None:
        self.root = options["root"]
        self.pk = options["pk"]
        self.start_version = int(options.get("start_version", 0))
        self.n_buckets = int(options.get("n_buckets", 4))
        self.schema_names = schema_names

    def _table(self):
        from ru_cdc_spark.operators.acid_table import AcidTable

        # log replay is pure filesystem — no SparkSession needed
        return AcidTable(spark=None, root=self.root, pk=self.pk)

    def initialOffset(self) -> dict:  # noqa: N802
        return {"version": self.start_version}

    def latestOffset(self) -> dict:  # noqa: N802
        latest = self._table().latest_version()
        return {"version": max(self.start_version,
                               latest if latest is not None else -1)}

    def partitions(self, start: dict,
                   end: dict) -> Sequence[InputPartition]:
        return [_CdfPartition(int(start["version"]),
                              int(end["version"]), b, self.n_buckets)
                for b in range(self.n_buckets)]

    def read(self, partition: _CdfPartition) -> Iterator[tuple]:
        import pandas as pd
        import pyarrow.parquet as pq

        if partition.to_v <= partition.from_v:
            return
        table = self._table()

        def load(paths: list[str]) -> pd.DataFrame:
            frames = [pq.read_table(p).to_pandas() for p in paths]
            if not frames:
                return pd.DataFrame(columns=self.schema_names[2:])
            df = pd.concat(frames, ignore_index=True)
            mask = df[self.pk].map(
                lambda v: _bucket_of(v) % partition.n_buckets
                == partition.bucket)
            return df[mask]

        val_cols = [c for c in self.schema_names[2:] if c != self.pk]
        for v in range(partition.from_v + 1, partition.to_v + 1):
            pre_files = {f["path"] for f in table.active_files(v - 1)} \
                if v > 0 else set()
            post_files = {f["path"] for f in table.active_files(v)}
            pre = load(sorted(pre_files - post_files))
            post = load(sorted(post_files - pre_files))
            merged = pre.merge(post, on=self.pk, how="outer",
                               suffixes=("__pre", "__post"),
                               indicator=True)
            # to_dict, not itertuples: itertuples positionally renames
            # any column starting with "_" (including the indicator)
            for d in merged.to_dict("records"):
                which = d["_merge"]
                pk_val = d[self.pk]

                def vals(side: str) -> list:
                    out = []
                    for c in val_cols:
                        x = d.get(f"{c}{side}", d.get(c))
                        out.append(None if pd.isna(x) else x)
                    return out

                if which == "right_only":
                    yield (v, "insert", pk_val, *vals("__post"))
                elif which == "left_only":
                    yield (v, "delete", pk_val, *vals("__pre"))
                else:
                    a, b = vals("__pre"), vals("__post")
                    if a != b:
                        yield (v, "update_preimage", pk_val, *a)
                        yield (v, "update_postimage", pk_val, *b)

    def commit(self, end: dict) -> None:
        pass


class AcidCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "acid_cdf"

    def _ddl(self) -> tuple[str, list[str]]:
        import pyarrow.parquet as pq

        from ru_cdc_spark.operators.acid_table import AcidTable

        table = AcidTable(spark=None, root=self.options["root"],
                          pk=self.options["pk"])
        files = table.active_files()
        if not files:
            raise ValueError("CDF source needs a table with version 0")
        arrow = pq.read_schema(files[0]["path"])
        pk = self.options["pk"]
        cols = [(pk, _ddl_of_arrow(arrow.field(pk).type))]
        cols += [(f.name, _ddl_of_arrow(f.type))
                 for f in arrow if f.name != pk]
        ddl = "version int, _change_type string, " + ", ".join(
            f"{n} {t}" for n, t in cols)
        names = ["version", "_change_type"] + [n for n, _ in cols]
        return ddl, names

    def schema(self) -> str:
        ddl, _ = self._ddl()
        return ddl

    def streamReader(self, schema) -> AcidCdfStreamReader:  # noqa: N802
        _, names = self._ddl()
        return AcidCdfStreamReader(dict(self.options), names)


def register_acid_cdf_source(spark) -> None:
    spark.dataSource.register(AcidCdfDataSource)
