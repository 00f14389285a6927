"""Pure-Python PCM WAV codec (stdlib ``struct`` + numpy), from the
RIFF/WAVE specification.

Closes the "audio is fake-only" gap the same way ``png.py``/``jpeg.py``
did for images: RIFF chunk framing, the ``fmt `` chunk (PCM format tag
1, channels, sample rate, block align), and the ``data`` chunk with
8-bit unsigned / 16-bit signed little-endian PCM — the layouts real
training corpora overwhelmingly carry. Float/ADPCM/extensible formats
raise with a clear message instead of mis-decoding.

PCM roundtrips are bit-exact (no lossy stage), so oracle queries can
hash sample sums directly. Decode runs inside ``mapInPandas`` Arrow
batches (operators/multimodal.py) — payloads stay executor-side.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """int array (n,) mono or (n, ch) -> PCM WAV bytes. ``bits``: 16
    (signed LE, the standard) or 8 (unsigned)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise WavError(f"unsupported sample shape {s.shape}")
    n, ch = s.shape
    if bits == 16:
        data = s.astype("<i2").tobytes()
    elif bits == 8:
        data = s.astype(np.uint8).tobytes()
    else:
        raise WavError("bits must be 8 or 16")
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (samples (n, ch) int array, sample_rate).
    16-bit decodes to int16, 8-bit to uint8."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise WavError("missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1:
        raise WavError(f"only PCM (format 1) supported, got {audio_fmt}")
    if bits == 16:
        s = np.frombuffer(pcm[:len(pcm) // (2 * ch) * 2 * ch],
                          dtype="<i2").reshape(-1, ch)
    elif bits == 8:
        s = np.frombuffer(pcm[:len(pcm) // ch * ch],
                          dtype=np.uint8).reshape(-1, ch)
    else:
        raise WavError(f"unsupported bit depth {bits}")
    return s, rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """The features an audio curation pipeline gates on, in exact
    integer arithmetic where possible: duration, peak, energy (sum of
    squares — exact int), zero crossings (sign changes per channel,
    summed)."""
    s = samples.astype(np.int64)
    n = s.shape[0]
    signs = np.sign(s)
    # treat zeros as keeping the previous sign so a plateau at 0
    # doesn't double-count crossings
    nz = signs != 0
    crossings = 0
    for c in range(s.shape[1]):
        col = signs[nz[:, c], c]
        crossings += int(np.sum(col[1:] != col[:-1])) if len(col) else 0
    return {
        "n_samples": int(n),
        "channels": int(s.shape[1]),
        "sample_rate": int(sample_rate),
        "duration_ms": int(n * 1000) // int(sample_rate),
        "peak": int(np.abs(s).max()) if n else 0,
        "energy": int(np.sum(s * s)),
        "zero_crossings": crossings,
    }
