"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` + numpy).

The container ships no image libraries, so the multimodal operators'
``fake=False`` path needed a REAL codec implemented from the public PNG
specification (RFC 2083 / W3C PNG): chunk framing with CRC-32, IHDR,
IDAT deflate streams, and all five scanline filter types (None / Sub /
Up / Average / Paeth). Supported pixel formats: 8-bit grayscale (color
type 0), RGB (2), and RGBA (6), non-interlaced — the formats a training
data pipeline actually meets for thumbnails/tiles; everything else
raises with a clear message rather than mis-decoding.

The encoder always writes filter 0 (None) scanlines; the decoder handles
any filter, so third-party PNGs decode too. Both ends are numpy-
vectorized per scanline (Paeth is the only per-pixel-dependent filter
and runs row-sequential like every real decoder).

This is an engine component, not test scaffolding: decode runs inside
``mapInPandas`` Arrow batches (see operators/multimodal.py), so payload
bytes decode executor-side, partition-parallel, with nothing but derived
features shuffling downstream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA -> PNG bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise PngError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, compress_level))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos:pos + stride],
                             dtype=np.uint8).astype(np.uint16)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: + left
            cur = line.copy()
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif ftype == 2:  # Up: + above
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - channels]) if i >= channels else 0
                above = int(prev[i])
                upleft = int(prev[i - channels]) if i >= channels else 0
                cur[i] = (cur[i] + _paeth(left, above, upleft)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes, check_crc: bool = True) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) for grayscale, (H,W,C) otherwise."""
    if data[:8] != _MAGIC:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise PngError("truncated chunk header")
        length = struct.unpack_from(">I", data, pos)[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated {tag!r} chunk")
        if check_crc:
            crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise PngError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type} "
                       "(gray/RGB/RGBA only)")
    if interlace != 0:
        raise PngError("interlaced PNGs not supported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = h * (1 + w * channels)
    if len(raw) != expected:
        raise PngError(f"IDAT size {len(raw)} != expected {expected}")
    flat = _unfilter(raw, h, w, channels)
    return flat.reshape(h, w) if channels == 1 else \
        flat.reshape(h, w, channels)


def to_grayscale(px: np.ndarray) -> np.ndarray:
    """Integer Rec.601 luma ((77R + 150G + 29B) >> 8) — deterministic
    across platforms, no float rounding."""
    if px.ndim == 2:
        return px
    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downscale by integer block means (each output pixel
    averages its source box) — the resize step real thumbnail/pHash
    pipelines use, deterministic integer arithmetic."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean()
    return out
