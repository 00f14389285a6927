"""Pure-Python PNG codec tests: spec-level golden bytes, filter
coverage, CRC integrity, and the real (non-fake) multimodal pHash path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ru_cdc_spark.functions.png import (
    PngError,
    block_mean_resize,
    decode_png,
    encode_png,
    to_grayscale,
)


def _px(h, w, seed=0):
    return ((np.arange(h * w) * 7919 + seed) % 256).astype(
        np.uint8).reshape(h, w)


class TestRoundtrip:
    @pytest.mark.parametrize("shape", [(1, 1), (3, 5), (8, 8), (33, 17)])
    def test_grayscale(self, shape):
        px = _px(*shape)
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_rgb(self):
        px = np.dstack([_px(9, 11, s) for s in range(3)])
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_rgba(self):
        px = np.dstack([_px(6, 4, s) for s in range(4)])
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_signature_and_chunks(self):
        b = encode_png(_px(2, 2))
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        assert b[12:16] == b"IHDR"
        assert b[-8:-4] == b"IEND"

    def test_golden_ihdr_layout(self):
        """Width/height big-endian in IHDR, bit depth 8, gray type 0."""
        b = encode_png(_px(3, 7))
        w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
        assert (w, h, depth, ctype) == (7, 3, 8, 0)


def _manual_png(h, w, scanlines: bytes) -> bytes:
    """Assemble a PNG from pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


class TestFilters:
    """Decode third-party-style PNGs using every filter type; reference
    values computed from the spec's reconstruction functions."""

    def test_sub_filter(self):
        # row [10, 5, 5] with Sub filter stores [10, 251, 0]... build the
        # forward direction instead: raw row r, stored = r[i]-r[i-1]
        row = np.array([10, 15, 20, 25], dtype=np.uint8)
        stored = bytes([1, 10, 5, 5, 5])
        got = decode_png(_manual_png(1, 4, stored))
        assert np.array_equal(got, row.reshape(1, 4))

    def test_up_filter(self):
        r0 = bytes([0, 1, 2, 3])          # filter 0
        r1 = bytes([2, 10, 10, 10])       # filter 2: + row above
        got = decode_png(_manual_png(2, 3, r0 + r1))
        assert np.array_equal(got, np.array([[1, 2, 3], [11, 12, 13]],
                                            dtype=np.uint8))

    def test_average_filter(self):
        r0 = bytes([0, 2, 4, 6])
        # avg filter: stored = raw - (left + above)//2
        # raw row [10, 12, 14]; left=0 for first: 10 - (0+2)//2 = 9
        # second: 12 - (10+4)//2 = 5 ; third: 14 - (12+6)//2 = 5
        r1 = bytes([3, 9, 5, 5])
        got = decode_png(_manual_png(2, 3, r0 + r1))
        assert got[1].tolist() == [10, 12, 14]

    def test_paeth_filter(self):
        r0 = bytes([0, 3, 6, 9])
        # paeth predictor row 2: for first px: left=0, above=3, ul=0 ->
        # p=3 -> pred=3 (pb smallest); raw 7 stored 4
        r1 = bytes([4, 4, 1, 1])
        got = decode_png(_manual_png(2, 3, r0 + r1))
        # reconstruct by hand:
        # px0 = 4 + paeth(0,3,0)=3 -> 7
        # px1 = 1 + paeth(7,6,3)=7 -> 8  (pa=|1-7+6-7|.. compute spec-wise)
        row = got[1].tolist()
        assert row[0] == 7
        assert len(row) == 3

    def test_unknown_filter_rejected(self):
        bad = bytes([9, 1, 2, 3])
        with pytest.raises(PngError, match="filter"):
            decode_png(_manual_png(1, 3, bad))


class TestIntegrity:
    def test_crc_corruption_detected(self):
        b = bytearray(encode_png(_px(4, 4)))
        # flip a pixel byte inside IDAT without fixing the CRC
        idat_at = bytes(b).index(b"IDAT")
        b[idat_at + 10] ^= 0xFF
        with pytest.raises(PngError, match="CRC"):
            decode_png(bytes(b))

    def test_not_a_png(self):
        with pytest.raises(PngError, match="signature"):
            decode_png(b"JFIF....")

    def test_truncated(self):
        b = encode_png(_px(4, 4))
        with pytest.raises(PngError):
            decode_png(b[:20])

    def test_unsupported_bit_depth(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        b = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
             + chunk(b"IEND", b""))
        with pytest.raises(PngError, match="bit depth"):
            decode_png(b)


class TestHelpers:
    def test_grayscale_identity_on_gray(self):
        px = _px(5, 5)
        assert np.array_equal(to_grayscale(px), px)

    def test_grayscale_rec601_weights(self):
        px = np.zeros((1, 1, 3), dtype=np.uint8)
        px[0, 0] = [255, 0, 0]
        assert to_grayscale(px)[0, 0] == (77 * 255) >> 8
        px[0, 0] = [0, 255, 0]
        assert to_grayscale(px)[0, 0] == (150 * 255) >> 8

    def test_block_mean_resize_constant(self):
        px = np.full((64, 48), 200, dtype=np.uint8)
        out = block_mean_resize(px, 32, 32)
        assert out.shape == (32, 32)
        assert np.allclose(out, 200.0)

    def test_block_mean_resize_preserves_mean(self):
        px = _px(64, 64)
        out = block_mean_resize(px, 32, 32)
        assert abs(out.mean() - px.mean()) < 1.0


class TestRealPhashPath:
    def test_identical_images_same_hash_distinct_differ(self, spark):
        """fake=False pHash over real PNG payloads: byte-identical images
        collide, unrelated images don't."""
        from ru_cdc_spark.functions.png import encode_png as enc
        from ru_cdc_spark.operators.multimodal import image_phash

        imgs = {
            0: enc(_px(40, 40, seed=1)),
            1: enc(_px(40, 40, seed=1)),       # same pixels
            2: enc((_px(40, 40, seed=1).astype(int) + 1).clip(0, 255)
                   .astype(np.uint8)),         # +1 brightness: near-dup
            3: enc(_px(40, 40, seed=999_999)), # unrelated
        }
        df = spark.createDataFrame(
            [(k, bytearray(v)) for k, v in imgs.items()],
            "doc_id long, payload binary")
        got = {r.doc_id: r.phash
               for r in image_phash(df, fake=False).collect()}
        assert got[0] == got[1]
        ham_near = bin(got[0] ^ got[2]).count("1")
        ham_far = bin(got[0] ^ got[3]).count("1")
        assert ham_near <= 8
        assert ham_far > ham_near

    def test_decode_payload_real_png(self):
        from ru_cdc_spark.operators.multimodal import decode_payload

        meta = decode_payload(encode_png(_px(12, 34)), "image")
        assert (meta["width"], meta["height"], meta["n_frames"]) == \
            (34, 12, 1)

    def test_decode_payload_non_image_still_gated(self):
        from ru_cdc_spark.functions.jpeg import JpegError
        from ru_cdc_spark.operators.multimodal import decode_payload

        # formats without an in-repo codec remain honestly gated
        # (WAV/AVI are real now, so use a non-RIFF audio container)
        with pytest.raises(NotImplementedError):
            decode_payload(b"OggS vorbis-ish payload", "audio")
        # ...while a JPEG-magic payload now reaches the REAL decoder,
        # which rejects malformed bytes loudly instead of mis-decoding
        with pytest.raises(JpegError):
            decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
