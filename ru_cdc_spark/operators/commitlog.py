"""Atomic put-if-absent commit publishing, shared by the repo's two
file-backed transaction logs (the ACID table log in
``operators/acid_table.py`` and the LSH postings manifest in
``operators/similarity.py``).

The plain ``O_CREAT|O_EXCL`` claim both logs used through round 11 is
put-if-absent but NOT atomic in content: the file becomes visible to
``listdir`` at create time, then the payload is written afterwards — a
reader racing the gap (or scanning after a writer crashed mid-write)
json-loads a truncated/empty commit and fails permanently, with no
orphan-only story to fall back on. Fix: write the payload to a private
temp file first (flushed + fsynced), then ``os.link`` it to the final
name. ``link`` fails with ``FileExistsError`` when the version is
already claimed — put-if-absent is preserved — and the final name only
ever appears bound to its complete content, so no reader can observe a
torn commit. A crash between ``link`` and the temp unlink leaves only a
``*.tmp`` sibling that every version-listing filter already ignores.

On object stores the same contract comes from conditional PUT, which is
content-atomic by nature; this module is the POSIX equivalent.
"""

from __future__ import annotations

import contextlib
import os
import uuid


def sweep_tmp(log_dir: str) -> list[str]:
    """Remove ``*.tmp`` commit leftovers a writer left by crashing
    between the ``link`` and the temp unlink. This module owns the temp
    naming convention, so both log owners' vacuums call here instead of
    duplicating it. Call only quiesced relative to in-flight writers
    (a live writer's temp would look identical). Returns removed
    relative names."""
    removed: list[str] = []
    if not os.path.isdir(log_dir):
        return removed
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".tmp"):
            os.remove(os.path.join(log_dir, f))
            removed.append(f)
    return removed


def put_if_absent(path: str, payload: str) -> None:
    """Atomically publish ``payload`` at ``path`` iff nothing is there;
    raise ``FileExistsError`` when another writer claimed it first.
    Callers translate that into their log's conflict exception."""
    tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, path)
    finally:
        # suppress a missing tmp (e.g. an un-quiesced sweep raced the
        # write) so the link-time exception propagates unmasked instead
        # of being replaced by a confusing secondary FileNotFoundError
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)
