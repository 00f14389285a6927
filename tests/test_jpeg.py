"""Baseline JPEG codec (functions/jpeg.py): spec structure, golden
roundtrips, subsampling, restart markers, and the multimodal dispatch
path over mixed PNG+JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from ru_cdc_spark.functions.jpeg import (
    ZIGZAG,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 4) % 256, (yy * 4) % 256,
                     ((xx + yy) * 2) % 256], -1).astype(np.uint8)


class TestSpecStructure:
    def test_zigzag_is_the_published_order(self):
        """First and last entries of T.81 figure 5, plus the
        involution property (every natural index appears once)."""
        assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]
        assert sorted(ZIGZAG) == list(range(64))

    def test_markers_present_and_ordered(self):
        data = encode_jpeg(_gradient(16, 16), 80)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        # DQT before SOF0 before DHT before SOS
        idx = [data.index(bytes([0xFF, m]))
               for m in (0xDB, 0xC0, 0xC4, 0xDA)]
        assert idx == sorted(idx)

    def test_progressive_rejected(self):
        data = bytearray(encode_jpeg(_gradient(8, 8)))
        data[data.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
        with pytest.raises(JpegError, match="baseline"):
            decode_jpeg(bytes(data))

    def test_not_a_jpeg_rejected(self):
        with pytest.raises(JpegError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")


class TestGoldenRoundtrip:
    def test_solid_gray_exact_at_q100(self):
        """Solid blocks are DC-only; quality 100 quantizes by 1, so the
        roundtrip is mathematically exact — independent cross-check of
        DCT scaling, Huffman tables, and predictor chaining."""
        for v in (0, 1, 127, 128, 200, 255):
            img = np.full((24, 17), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, 100))
            assert out.shape == (24, 17)
            assert np.array_equal(out, img), f"value {v}"

    def test_gradient_rgb_tight(self):
        img = _gradient(41, 53)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_noise_bounded_error(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 75))
        assert out.shape == img.shape
        # lossy, but must stay in the realm of JPEG-at-75, not garbage
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 25

    def test_odd_dimensions_crop_exactly(self):
        for h, w in [(1, 1), (7, 9), (8, 8), (9, 17), (23, 8)]:
            img = np.full((h, w), 90, dtype=np.uint8)
            assert decode_jpeg(encode_jpeg(img, 100)).shape == (h, w)

    def test_lower_quality_smaller_file(self):
        img = _gradient(64, 64)
        assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 95))


class TestSubsamplingAndRestarts:
    def test_420_roundtrip(self):
        img = _gradient(41, 53)
        out = decode_jpeg(encode_jpeg(img, 95, subsampling="420"))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    def test_420_solid_color_exactish(self):
        img = np.full((20, 28, 3), [40, 180, 90], dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 100, subsampling="420"))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_restart_markers_roundtrip_identically(self):
        """RSTn framing must not change decoded pixels — same bits,
        different resync structure."""
        img = _gradient(50, 70)
        base = decode_jpeg(encode_jpeg(img, 92, subsampling="420"))
        for ri in (1, 2, 5):
            data = encode_jpeg(img, 92, subsampling="420",
                               restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI present
            assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
            assert np.array_equal(decode_jpeg(data), base)


class TestMultimodalDispatch:
    def test_decode_image_sniffs_both_formats(self):
        from ru_cdc_spark.functions.png import encode_png
        from ru_cdc_spark.operators.multimodal import decode_image

        img = np.full((9, 11), 77, dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(img)), img)
        assert np.array_equal(decode_image(encode_jpeg(img, 100)), img)
        with pytest.raises(ValueError):
            decode_image(b"neither format")

    def test_phash_real_path_over_mixed_payloads(self, spark, sf_dir):
        """image_phash(fake=False) runs the REAL decode over a mix of
        PNG and JPEG payloads in one DataFrame — format dispatch inside
        the Arrow batch operator."""
        from ru_cdc_spark.operators.multimodal import (
            attach_image_payload,
            image_phash,
        )
        from ru_cdc_spark.sources.readers import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents").where(
            F.col("doc_id") < 40)
        hashes = image_phash(attach_image_payload(docs),
                             fake=False).collect()
        assert len(hashes) == 40
        assert all(r["phash"] is not None for r in hashes)

    def test_decode_features_real_over_mixed(self, spark, sf_dir):
        """decode_features(fake=False) — metadata extraction with the
        real codecs over mixed payloads; dims must match the
        constructions."""
        from pyspark.sql import functions as F
        from ru_cdc_spark.operators.multimodal import (
            attach_image_payload,
            decode_features,
        )
        from ru_cdc_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents").where(
            F.col("doc_id") < 30)
        with_payload = attach_image_payload(docs).withColumn(
            "meta", F.struct(
                F.lit("image").alias("modality"),
                F.octet_length("payload").alias("byte_len"),
                F.md5("payload").alias("sha")))
        rows = decode_features(with_payload, fake=False).collect()
        assert len(rows) == 30
        for r in rows:
            assert r["width"] == 8 + r["doc_id"] % 5
            assert r["height"] == 8 + r["doc_id"] % 3
