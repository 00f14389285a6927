"""Pure-Python MJPEG-AVI container codec (stdlib ``struct``), from the
public RIFF/AVI specification.

Video payloads ride the engine as opaque binary; this module makes the
decode step REAL for the one video layout expressible with in-repo
codecs: AVI (RIFF ``AVI ``) whose streams are Motion-JPEG — every
frame an independent baseline JPEG, decoded by ``functions/jpeg.py``.
Structure parsed: LIST ``hdrl`` (``avih`` main header: frame period,
dims, total frames; ``strl``/``strh``/``strf`` stream headers), LIST
``movi`` with ``00dc`` compressed-frame chunks, and the ``idx1`` index.
Non-MJPEG fourccs raise with a clear message instead of mis-decoding.

Frame SAMPLING (every k-th frame — the training-pipeline operation)
only touches the sampled chunks: the movi walk skips unsampled frames
without decoding them, which is the property that matters at scale.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """JPEG frame blobs -> MJPEG AVI bytes."""
    if not frames:
        raise AviError("no frames")
    n = len(frames)
    avih = struct.pack("<14I",
                       1_000_000 // fps,  # microseconds per frame
                       0, 0, 0x10,        # max bytes/s, padding, flags
                       n, 0, 1, 0,        # frames, initial, streams, bufsz
                       width, height, 0, 0, 0, 0)
    # strh after the two fourccs: flags, priority+language, initial
    # frames, scale, rate (rate/scale = fps), start, length, suggested
    # buffer, quality, sample size, then the rcFrame rect
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII",
                          0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to movi list start
    idx_entries = []
    off = 4  # past the 'movi' kind fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off,
                                       len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, frames: [bytes]}
    WITHOUT decoding any frame — container metadata + raw JPEG blobs."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    meta: dict = {"frames": []}

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_lo = pos + 8
            if tag == b"LIST":
                walk(body_lo + 4, body_lo + size)
            elif tag == b"avih":
                vals = struct.unpack("<14I", data[body_lo:body_lo + 56])
                meta["fps"] = (1_000_000 // vals[0]) if vals[0] else 0
                meta["n_frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif tag == b"strh":
                if data[body_lo:body_lo + 4] == b"vids" and \
                        data[body_lo + 4:body_lo + 8] not in (b"MJPG",
                                                              b"mjpg"):
                    raise AviError(
                        "only MJPG video streams supported, got "
                        f"{data[body_lo + 4:body_lo + 8]!r}")
            elif tag == b"00dc":
                meta["frames"].append(data[body_lo:body_lo + size])
            pos = body_lo + size + (size & 1)

    walk(12, len(data))
    if "n_frames" not in meta:
        raise AviError("missing avih header")
    return meta


def sample_frames(data: bytes, every_k: int = 1,
                  max_frames: int | None = None) -> list:
    """Decode every k-th MJPEG frame to pixel arrays — unsampled frames
    are never JPEG-decoded (the container walk just skips their bytes),
    which is what makes sparse sampling of long videos cheap."""
    from ru_cdc_spark.functions.jpeg import decode_jpeg

    meta = parse_avi(data)
    picked = meta["frames"][::max(1, every_k)]
    if max_frames is not None:
        picked = picked[:max_frames]
    return [decode_jpeg(f) for f in picked]
