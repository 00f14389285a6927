"""A native streaming sink with queue semantics (Python DataSource V2
stream writer) — the engine-side analog of the reference's Redis sink.

The reference RPUSHes each message onto a per-topic Redis list and only
afterwards checkpoints its position (message_queue.rs:137-172, 74-83) —
at-least-once: a crash between send and checkpoint duplicates. This sink
gets effective exactly-once from the two-phase shape Spark drives:

1. ``write(iterator)`` runs per partition task and stages rows into a
   uniquely named file per (batch, partition, uuid) under
   ``<path>/.staging/`` — a crashed/retried task leaves only garbage
   staging files, never visible data.
2. ``commit(messages, batchId)`` runs once on the driver after every
   task succeeded and atomically publishes the staged files into the
   per-topic queue directories plus a ``manifest-<batchId>.json``; a
   replayed batch id is detected via its manifest and skipped, so
   checkpoint replay cannot double-enqueue (the fix for the reference's
   at-least-once gap).
3. ``abort`` discards that batch's staging files.

Consumers resolve messages ONLY through the manifests, in batch order —
list semantics per topic, like RPUSH/LPOP. A crash between publishing
files and writing the manifest leaves unmanifested (invisible) files, so
the replayed batch can publish again without consumers ever seeing
duplicates — the same readers-resolve-via-log rule as the versioned
snapshot store.

Scale: staging is executor-local parallel writes (no driver data path);
commit moves file handles, not bytes. Topic fan-out uses the row's
``topic`` column exactly like the Kafka sink's per-row routing (K1).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row


@dataclass
class StagedFiles(WriterCommitMessage):
    files: list  # [(topic, staged_path, n_rows)]


class QueueStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.topic_col = options.get("topic_col", "topic")
        self.value_col = options.get("value_col", "payload")
        # fault injection (contract tests): marker-file one-shot crashes.
        # fail_task_once: the first write() attempt dies mid-stage;
        # crash_after_publish_once: commit() dies AFTER moving files +
        # writing the manifest but BEFORE Spark checkpoints the batch —
        # the exact window where the reference's send-then-checkpoint
        # design duplicates (message_queue.rs:74-83).
        self.fail_task_once = options.get("fail_task_once")
        self.crash_after_publish_once = options.get(
            "crash_after_publish_once")

    @staticmethod
    def _trip(marker: str | None) -> bool:
        """True exactly once per marker path (atomic create)."""
        if not marker:
            return False
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def _staging(self) -> str:
        d = os.path.join(self.path, ".staging")
        os.makedirs(d, exist_ok=True)
        return d

    def write(self, iterator: Iterator[Row]) -> StagedFiles:
        buckets: dict[str, list[str]] = {}
        for row in iterator:
            buckets.setdefault(row[self.topic_col], []).append(row[self.value_col])
        staged = []
        for topic, values in buckets.items():
            name = f"{topic}-{uuid.uuid4().hex}.jsonl"
            p = os.path.join(self._staging(), name)
            with open(p, "w") as fh:
                fh.write("\n".join(values))
            staged.append((topic, p, len(values)))
        if self._trip(self.fail_task_once):
            # die AFTER staging: the retried attempt must re-stage under a
            # fresh uuid and the garbage file must stay invisible
            raise RuntimeError("injected task failure (fail_task_once)")
        return StagedFiles(files=staged)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        manifest = os.path.join(self.path, f"manifest-{batchId}.json")
        if os.path.exists(manifest):  # replayed batch: already published
            for m in messages:
                for _, p, _ in (m.files if m else []):
                    if os.path.exists(p):
                        os.remove(p)
            return
        published = []
        for m in messages:
            for topic, p, n in (m.files if m else []):
                tdir = os.path.join(self.path, topic)
                os.makedirs(tdir, exist_ok=True)
                dest = os.path.join(tdir, f"{batchId:012d}-{os.path.basename(p)}")
                shutil.move(p, dest)
                published.append({"topic": topic, "file": dest, "rows": n})
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch": batchId, "published": published}, fh)
        os.replace(tmp, manifest)
        if self._trip(self.crash_after_publish_once):
            # the at-least-once window: published + manifested, but the
            # batch will FAIL before Spark checkpoints it — replay must
            # hit the manifest guard above and publish nothing twice
            raise RuntimeError(
                "injected post-publish crash (crash_after_publish_once)")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages:
            for _, p, _ in (m.files if m else []):
                if os.path.exists(p):
                    os.remove(p)


class QueueSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "list_queue"

    def streamWriter(self, schema, overwrite: bool) -> QueueStreamWriter:  # noqa: N802
        return QueueStreamWriter(dict(self.options))


def register_queue_sink(spark) -> None:
    spark.dataSource.register(QueueSinkDataSource)


def _manifests(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        (name for name in os.listdir(path)
         if name.startswith("manifest-") and name.endswith(".json")),
        key=lambda n: int(n[len("manifest-"):-len(".json")]),
    )


def read_queue(path: str, topic: str) -> list[str]:
    """Consumer view: the topic's messages in enqueue (batch) order,
    resolved through the committed manifests — files a crashed commit
    published without manifesting are invisible (no duplicates on
    replay). File locations resolve relative to THIS queue root (topic +
    basename), so a moved/remounted queue directory stays readable."""
    out: list[str] = []
    for name in _manifests(path):
        with open(os.path.join(path, name)) as fh:
            entry = json.load(fh)
        for pub in entry["published"]:
            if pub["topic"] != topic:
                continue
            fpath = os.path.join(path, pub["topic"],
                                 os.path.basename(pub["file"]))
            with open(fpath) as fh:
                content = fh.read()
            if content:
                out.extend(content.split("\n"))
    return out


def vacuum_unmanifested(path: str) -> list[str]:
    """GC for crash orphans: delete topic files no manifest references and
    leftover staging files. Orphans are invisible to consumers (manifests
    are the read path) but would otherwise accumulate forever across
    failure-replay cycles. Returns the deleted paths."""
    if not os.path.isdir(path):
        return []
    referenced = set()
    topics = set()
    for name in _manifests(path):
        with open(os.path.join(path, name)) as fh:
            entry = json.load(fh)
        for pub in entry["published"]:
            topics.add(pub["topic"])
            referenced.add((pub["topic"], os.path.basename(pub["file"])))
    deleted: list[str] = []
    for entry_name in os.listdir(path):
        tdir = os.path.join(path, entry_name)
        if entry_name == ".staging" and os.path.isdir(tdir):
            for f in os.listdir(tdir):
                p = os.path.join(tdir, f)
                os.remove(p)
                deleted.append(p)
            continue
        if not os.path.isdir(tdir) or entry_name not in topics:
            continue
        for f in os.listdir(tdir):
            if (entry_name, f) not in referenced:
                p = os.path.join(tdir, f)
                os.remove(p)
                deleted.append(p)
    return deleted
