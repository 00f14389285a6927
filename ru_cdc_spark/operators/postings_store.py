"""Manifest-committed postings store — the shared persistence layer
behind the engine's retrieval indexes (the ANN L-tables index in
``operators/similarity.py`` and the dedup MinHash band index in
``operators/dedup.py``).

Layout and contract (r12; grew out of the ANN index's manifest
upgrade, generalized here because the dedup band index needs the
identical lifecycle):

* data files live in a hive layout ``<partition_col>=<v>/...parquet``,
  each file sorted by ``sort_cols`` so parquet min/max row-group stats
  prune point lookups on the secondary key;
* every mutation commits a file-list delta to
  ``_log/{version:020d}.json``, claimed put-if-absent via the atomic
  temp-write + ``os.link`` helper (``operators/commitlog.py``) — a
  commit name never appears without its complete content;
* readers PIN a manifest version once (``postings()``), then read
  exactly the immutable files that version names — concurrent appends
  and compactions are invisible, there is no swap window, and nothing
  deletes data except an explicit ``vacuum()``;
* compaction rewrites each partition to one sorted file BESIDE the old
  files and retires them in one atomic commit; appends racing it are
  preserved by the rebase loop; dual compactors are refused loudly;
* a writer crash at ANY point before its commit leaves only orphan
  files/staging dirs no manifest references — swept by ``vacuum()``;
* every ``CHECKPOINT_INTERVAL`` commits, the live set is snapshotted
  next to the log so reader replay is O(interval), not O(history).

100 TB story: maintenance coordination cost is one tiny JSON write
regardless of index size; readers and writers never block each other;
on object stores the same semantics come from conditional PUT.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.operators.commitlog import put_if_absent


class StoreCommitConflict(RuntimeError):
    """Another writer claimed this manifest version first — retry."""


class PostingsStore:
    """One persisted, manifest-committed postings index directory."""

    CHECKPOINT_INTERVAL = 10  # snapshot the live set every N commits

    def __init__(self, index_dir: str, partition_col: str,
                 sort_cols: tuple[str, ...],
                 n_partitions: int | None = None):
        assert sort_cols and sort_cols[0] == partition_col, (
            "partition column must LEAD the sort: the dynamic-partition "
            "writer would otherwise insert its own unstable sort and "
            "scramble the secondary order the stats pruning needs")
        self.index_dir = index_dir
        self.partition_col = partition_col
        self.sort_cols = sort_cols
        # performance HINT only (r13): the expected distinct-value count
        # of partition_col. When set, staging shuffles into exactly this
        # many hash partitions instead of spark.sql.shuffle.partitions +
        # AQE coalescing — measured 0.4s/write cheaper at fixture scale
        # (the coalesce machinery itself) and a no-op for layout
        # guarantees: hash routing still sends each partition value to
        # exactly one task, so "one sorted file per partition per batch"
        # holds for ANY value here.
        self.n_partitions = n_partitions

    # -- manifest log --------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.index_dir, "_log")

    def _log_file(self, version: int) -> str:
        return os.path.join(self._log_dir(), f"{version:020d}.json")

    def versions(self) -> list[int]:
        log = self._log_dir()
        if not os.path.isdir(log):
            return []
        return sorted(int(f.split(".")[0]) for f in os.listdir(log)
                      if f.endswith(".json")
                      and not f.endswith(".checkpoint.json")
                      and not f.endswith(".tmp"))

    def version(self) -> int:
        vs = self.versions()
        if not vs:
            raise RuntimeError(
                f"{self.index_dir}: no postings manifest — not an "
                "index (build first)")
        return vs[-1]

    def meta(self) -> dict:
        """The configuration the index was BUILT with — read from the
        build commit so maintenance and serving agree with the build's
        (possibly corpus-adaptive) choice, never session constants."""
        vs = self.versions()
        if not vs:
            raise RuntimeError(
                f"{self.index_dir}: no postings manifest — not an "
                "index (build first)")
        with open(self._log_file(vs[0])) as fh:
            entry = json.load(fh)
        meta = entry.get("meta")
        if not meta:
            raise RuntimeError(
                f"{self.index_dir}: build commit carries no metadata — "
                "rebuild the index (pre-r12 layout)")
        return meta

    def _read_commit(self, version: int) -> dict:
        with open(self._log_file(version)) as fh:
            return json.load(fh)

    def ops(self) -> list[str]:
        """The op of every commit, in version order (audit helper)."""
        return [self._read_commit(v)["op"] for v in self.versions()]

    def _try_commit(self, version: int, op: str, add: list[str],
                    remove: list[str], meta: dict | None = None,
                    schema_json: str | None = None) -> None:
        os.makedirs(self._log_dir(), exist_ok=True)
        entry = {"version": version, "op": op,
                 "add": sorted(add), "remove": sorted(remove)}
        if meta is not None:
            entry["meta"] = meta
        if schema_json is not None:
            entry["schema"] = schema_json
        try:
            put_if_absent(self._log_file(version),
                          json.dumps(entry, sort_keys=True))
        except FileExistsError as exc:
            raise StoreCommitConflict(
                f"manifest version {version} already committed") from exc

    # -- checkpoints ----------------------------------------------------

    def _checkpoint_file(self, version: int) -> str:
        return os.path.join(self._log_dir(),
                            f"{version:020d}.checkpoint.json")

    def _latest_checkpoint(
            self, at_or_below: int) -> tuple[int, list[str]] | None:
        cps = sorted(int(f.split(".")[0])
                     for f in os.listdir(self._log_dir())
                     if f.endswith(".checkpoint.json"))
        cps = [v for v in cps if v <= at_or_below]
        if not cps:
            return None
        with open(self._checkpoint_file(cps[-1])) as fh:
            return cps[-1], json.load(fh)["files"]

    def _maybe_checkpoint(self, version: int) -> None:
        """Every CHECKPOINT_INTERVAL commits, snapshot the full live
        set next to the log so reader replay stays O(interval), not
        O(history). Best-effort and crash-safe: tmp + atomic replace,
        racing writers produce identical content for the same version,
        readers that miss it just replay more commits."""
        if version == 0 or version % self.CHECKPOINT_INTERVAL:
            return
        _v, live = self.live_files(version)
        tmp = self._checkpoint_file(version) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": live}, fh)
        os.replace(tmp, self._checkpoint_file(version))

    # -- reads ----------------------------------------------------------

    def live_files(self,
                   version: int | None = None) -> tuple[int, list[str]]:
        """Replay the log up to ``version`` (default latest) — seeded
        from the newest checkpoint at or below it — and return
        ``(version, sorted relative paths)``: the PIN a reader resolves
        once and then trusts for its whole query."""
        vs = self.versions()
        if not vs:
            raise RuntimeError(
                f"{self.index_dir}: no postings manifest — not an "
                "index (build first)")
        if version is None:
            version = vs[-1]
        live: set[str] = set()
        seed_version = -1
        cp = self._latest_checkpoint(version)
        if cp is not None:
            seed_version, files = cp
            live = set(files)
        for v in vs:
            if v <= seed_version:
                continue
            if v > version:
                break
            m = self._read_commit(v)
            live -= set(m["remove"])
            live |= set(m["add"])
        return version, sorted(live)

    def postings(self, spark: SparkSession,
                 version: int | None = None) -> DataFrame:
        """Manifest-pinned scan: resolve the live file set ONCE, read
        exactly those files — never a raw directory listing, so
        concurrent maintenance (and uncommitted staging leftovers) are
        invisible."""
        _v, files = self.live_files(version)
        if not files:
            # zero paths would make spark.read.parquet() fail with an
            # opaque "path not specified" — name the index/version so an
            # empty pin (empty-frame build/append, compact over nothing)
            # diagnoses itself
            raise RuntimeError(
                f"{self.index_dir}: version {_v} pins no live files — "
                "the index is empty at this version (empty build/append "
                "commit, or compaction of an empty pin)")
        reader = spark.read.option("basePath", self.index_dir)
        schema = self._schema()
        if schema is not None:
            # the build commit recorded the postings schema (r13):
            # supplying it skips the footer-sampling schema-inference
            # job every pinned read otherwise pays
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(schema)))
        return reader.parquet(*[os.path.join(self.index_dir, f)
                                for f in files])

    def _schema(self) -> str | None:
        """Schema JSON recorded by the build commit (None on pre-r13
        indexes, which fall back to parquet schema inference)."""
        vs = self.versions()
        if not vs:
            return None
        return self._read_commit(vs[0]).get("schema")

    # -- writes ---------------------------------------------------------

    def _stage_in(self, postings: DataFrame) -> list[str]:
        """Write a postings batch to a private staging dir, then MOVE
        each parquet file into the shared hive layout (same filesystem:
        the move is a rename) and return the relative paths. Files are
        INVISIBLE until a manifest commit names them; Spark's part-file
        names embed a UUID, so concurrent writers never collide. The
        repartition on the partition column co-locates each partition
        in one task — one sorted file per partition per batch."""
        staged = os.path.join(self.index_dir,
                              f".staged-{uuid.uuid4().hex[:12]}")
        part = (postings.repartition(self.n_partitions,
                                     F.col(self.partition_col))
                if self.n_partitions
                else postings.repartition(F.col(self.partition_col)))
        (part.sortWithinPartitions(*self.sort_cols)
         .write.mode("overwrite")
         .partitionBy(self.partition_col).parquet(staged))
        prefix = f"{self.partition_col}="
        added: list[str] = []
        for part in sorted(os.listdir(staged)):
            if not part.startswith(prefix):
                continue
            os.makedirs(os.path.join(self.index_dir, part),
                        exist_ok=True)
            for f in sorted(os.listdir(os.path.join(staged, part))):
                if not f.endswith(".parquet"):
                    continue
                rel = f"{part}/{f}"
                os.rename(os.path.join(staged, part, f),
                          os.path.join(self.index_dir, rel))
                added.append(rel)
        shutil.rmtree(staged)
        return added

    def build(self, postings: DataFrame, meta: dict) -> None:
        """CREATE the index (version 0), superseding anything at the
        path — not a concurrent-maintenance op; append/compact/postings
        are."""
        if os.path.isdir(self.index_dir):
            shutil.rmtree(self.index_dir)
        os.makedirs(self.index_dir)
        added = self._stage_in(postings)
        self._try_commit(0, "build", added, [], meta=meta,
                         schema_json=postings.schema.json())

    def _require_build_schema(self, postings: DataFrame) -> None:
        """Pinned reads apply the BUILD commit's recorded schema to
        every version (postings()), so later commits must not change
        the column set/types — a drifted append would be silently
        null-filled or column-dropped on read where mergeSchema would
        have surfaced it (r14 advice fix: enforce the invariant
        instead of assuming it). Nullability is ignored: joins and
        aggregates legitimately toggle it without changing the data
        layout."""
        recorded = self._schema()
        if recorded is None:
            return  # pre-r13 index: reads mergeSchema anyway
        want = [(f["name"], f["type"])
                for f in json.loads(recorded)["fields"]]
        got = [(f["name"], f["type"])
               for f in json.loads(postings.schema.json())["fields"]]
        if want != got:
            raise RuntimeError(
                f"{self.index_dir}: staged batch schema {got} does not "
                f"match the build commit's recorded schema {want} — "
                "pinned reads would silently null-fill/drop columns; "
                "rebuild the index or conform the batch")

    def append(self, postings: DataFrame) -> None:
        """Admit a batch without touching existing files: one new
        sorted file per partition, made visible by ONE commit. Adds
        commute, so a lost put-if-absent race just re-claims the next
        version; a crash before the commit leaves invisible orphans."""
        self.version()  # refuse to invent an index
        self._require_build_schema(postings)
        added = self._stage_in(postings)
        while True:
            version = self.versions()[-1] + 1
            try:
                self._try_commit(version, "append", added, [])
                self._maybe_checkpoint(version)
                return
            except StoreCommitConflict:
                continue

    def compact(self, spark: SparkSession,
                pin_version: int | None = None) -> None:
        """Rewrite each partition to one sorted file beside the old
        files and retire the pinned set in one atomic commit. Readers
        are never exposed (nothing is deleted here); appends racing the
        compaction survive via the rebase loop; a compactor whose
        pinned remove-set was already retired is refused loudly.
        ``pin_version`` compacts as of an older committed version (ops/
        test hook)."""
        pin_v, pin_files = self.live_files(pin_version)
        compacted = (self.postings(spark, pin_v)
                     .select(*[F.col(c) for c in self.sort_cols]))
        self._require_build_schema(compacted)
        added = self._stage_in(compacted)
        while True:
            latest, live = self.live_files()
            gone = set(pin_files) - set(live)
            if gone:
                raise RuntimeError(
                    f"concurrent compaction detected on "
                    f"{self.index_dir}: {len(gone)} files this "
                    "compaction planned to retire were already removed "
                    "by another committer — run ONE compactor at a "
                    "time (appends are safe to race)")
            try:
                self._try_commit(latest + 1, "compact", added, pin_files)
                self._maybe_checkpoint(latest + 1)
                return
            except StoreCommitConflict:
                continue

    def vacuum(self, retain_versions: int = 0) -> list[str]:
        """Physically delete files no manifest in the retained window
        references — retired compaction inputs, crashed writers'
        orphans, and abandoned staging dirs. The ONLY deleter, explicit
        and offline: run quiesced relative to in-flight WRITERS (their
        uncommitted files look like orphans); readers need no quiescing
        while ``retain_versions`` covers the oldest in-flight pin."""
        vs = self.versions()
        if not vs:
            raise RuntimeError(
                f"{self.index_dir}: no postings manifest — not an "
                "index")
        referenced: set[str] = set()
        for v in vs[-(retain_versions + 1):]:
            referenced |= set(self.live_files(v)[1])
        prefix = f"{self.partition_col}="
        removed: list[str] = []
        # commit temp files a writer left by crashing between link and
        # unlink in put_if_absent: vacuum runs quiesced relative to
        # writers, so any surviving *.tmp in the log is dead
        from ru_cdc_spark.operators.commitlog import sweep_tmp
        removed += [f"_log/{f}" for f in sweep_tmp(self._log_dir())]
        for part in sorted(os.listdir(self.index_dir)):
            if part.startswith(".staged-"):
                shutil.rmtree(os.path.join(self.index_dir, part))
                removed.append(part)
                continue
            if not part.startswith(prefix):
                continue
            for f in sorted(os.listdir(
                    os.path.join(self.index_dir, part))):
                rel = f"{part}/{f}"
                if f.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(self.index_dir, rel))
                    removed.append(rel)
        return removed
