"""MySQL 8 partial JSON updates: the JSON-diff payload carried by
``PARTIAL_UPDATE_ROWS_EVENT`` (binlog event type 39, emitted when the
server runs ``binlog_row_value_options=PARTIAL_JSON``).

Instead of re-shipping a whole JSON document on UPDATE, the after-image
carries a sequence of diffs — (operation, path, value) triples — to
apply against the before-image. The reference has no handling for this
at all (``/root/reference/src/binlog.rs:322-329`` treats every JSON
column as an opaque blob), so a real 2026 server with that option set
produces events it cannot decode.

Public formats implemented here:

* **operations** (sql/json_diff.h enum): REPLACE=0, INSERT=1, REMOVE=2;
* **binary diff sequence** (each diff): 1-byte operation; lenenc path
  length + JSON-path bytes (``$.member[3]."quoted name"``); for
  REPLACE/INSERT a lenenc value length + full binary JSON value
  (type byte + payload, the same document format as
  sources/mysql_json.py);
* **application semantics** (sql docs, JSON_SET/JSON_INSERT/
  JSON_REMOVE): REPLACE overwrites an existing member/element; INSERT
  adds a missing member or appends/inserts an array element; REMOVE
  deletes; a diff whose path does not resolve is a no-op on the
  document (MySQL applies diffs best-effort in order).
"""

from __future__ import annotations

import re

from ru_cdc_spark.sources.mysql_json import decode_json, encode_json

DIFF_REPLACE = 0
DIFF_INSERT = 1
DIFF_REMOVE = 2

_OPS = {DIFF_REPLACE, DIFF_INSERT, DIFF_REMOVE}

_LEG_RE = re.compile(
    r"""\.(?:([A-Za-z_][A-Za-z0-9_]*)|"((?:[^"\\]|\\.)*)")  # .member
        |\[(\d+)\]                                          # [index]
    """, re.VERBOSE)


def parse_json_path(path: str) -> list[tuple[str, str | int]]:
    """``$.a.b[3]."x y"`` -> [("member","a"),("member","b"),
    ("index",3),("member","x y")]."""
    if not path.startswith("$"):
        raise ValueError(f"JSON path must start with $: {path!r}")
    legs: list[tuple[str, str | int]] = []
    pos = 1
    while pos < len(path):
        m = _LEG_RE.match(path, pos)
        if not m:
            raise ValueError(f"bad JSON path leg at {pos} in {path!r}")
        if m.group(3) is not None:
            legs.append(("index", int(m.group(3))))
        elif m.group(1) is not None:
            legs.append(("member", m.group(1)))
        else:
            legs.append(("member",
                         m.group(2).replace('\\"', '"').replace("\\\\",
                                                                "\\")))
        pos = m.end()
    return legs


# ---------------------------------------------------------------------------
# wire codec (lenenc = MySQL net_field_length, same as the binlog layer)
# ---------------------------------------------------------------------------


def _write_lenenc(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def _read_lenenc(b: bytes, off: int) -> tuple[int, int]:
    first = b[off]
    if first < 251:
        return first, off + 1
    if first == 0xFC:
        return int.from_bytes(b[off + 1:off + 3], "little"), off + 3
    if first == 0xFD:
        return int.from_bytes(b[off + 1:off + 4], "little"), off + 4
    return int.from_bytes(b[off + 1:off + 9], "little"), off + 9


def encode_json_diffs(diffs: list[tuple[int, str, object]]) -> bytes:
    """[(op, path, value)] -> the partial-column payload. ``value`` is
    ignored for REMOVE."""
    out = bytearray()
    for diff in diffs:
        op, path, value = diff if len(diff) == 3 else (*diff, None)
        if op not in _OPS:
            raise ValueError(f"unknown diff operation {op}")
        out.append(op)
        p = path.encode("utf-8")
        out += _write_lenenc(len(p)) + p
        if op != DIFF_REMOVE:
            v = encode_json(value)
            out += _write_lenenc(len(v)) + v
    return bytes(out)


def decode_json_diffs(b: bytes) -> list[tuple[int, str, object]]:
    diffs: list[tuple[int, str, object]] = []
    off = 0
    while off < len(b):
        op = b[off]
        off += 1
        if op not in _OPS:
            raise ValueError(f"unknown diff operation {op} at {off - 1}")
        n, off = _read_lenenc(b, off)
        path = b[off:off + n].decode("utf-8")
        off += n
        value = None
        if op != DIFF_REMOVE:
            vn, off = _read_lenenc(b, off)
            value = decode_json(b[off:off + vn])
            off += vn
        diffs.append((op, path, value))
    return diffs


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------


def _navigate(doc, legs):
    """Walk to the parent of the final leg; returns (parent, last_leg)
    or None when an intermediate leg does not resolve."""
    cur = doc
    for kind, key in legs[:-1]:
        if kind == "member":
            if not isinstance(cur, dict) or key not in cur:
                return None
            cur = cur[key]
        else:
            if not isinstance(cur, list) or not (0 <= key < len(cur)):
                return None
            cur = cur[key]
    return cur, legs[-1]


def apply_json_diffs(doc, diffs: list[tuple[int, str, object]]):
    """Apply diffs in order to a decoded JSON document (Python value),
    returning the new document. The input is not mutated. Unresolvable
    paths are no-ops, matching server-side best-effort application."""
    import copy

    doc = copy.deepcopy(doc)
    for op, path, value in diffs:
        legs = parse_json_path(path)
        if not legs:
            if op == DIFF_REPLACE:
                doc = value  # whole-document replace ($)
            continue
        hit = _navigate(doc, legs)
        if hit is None:
            continue
        parent, (kind, key) = hit
        if op == DIFF_REPLACE:
            if kind == "member" and isinstance(parent, dict) \
                    and key in parent:
                parent[key] = value
            elif kind == "index" and isinstance(parent, list) \
                    and 0 <= key < len(parent):
                parent[key] = value
        elif op == DIFF_INSERT:
            if kind == "member" and isinstance(parent, dict) \
                    and key not in parent:
                parent[key] = value
            elif kind == "index" and isinstance(parent, list):
                parent.insert(key, value)  # append when key >= len
        else:  # REMOVE
            if kind == "member" and isinstance(parent, dict):
                parent.pop(key, None)
            elif kind == "index" and isinstance(parent, list) \
                    and 0 <= key < len(parent):
                parent.pop(key)
    return doc
