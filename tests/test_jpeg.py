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

    def test_arithmetic_coding_rejected(self):
        data = bytearray(encode_jpeg(_gradient(8, 8)))
        data[data.index(b"\xff\xc0") + 1] = 0xC9  # SOF0 -> SOF9
        with pytest.raises(JpegError, match="frame type"):
            decode_jpeg(bytes(data))

    def test_sof2_with_full_scan_decodes_like_baseline(self):
        # a full-spectrum scan inside an SOF2 frame decodes through the
        # same accumulate-then-finish path as the baseline marker
        base = encode_jpeg(_gradient(16, 16))
        prog = bytearray(base)
        prog[prog.index(b"\xff\xc0") + 1] = 0xC2
        assert (decode_jpeg(bytes(prog)) == decode_jpeg(base)).all()

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


REAL_JPEG_DIRS = [
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin",
    "/usr/share/doc/nodejs",
]


def _real_jpegs():
    import glob
    import os

    files = []
    for d in REAL_JPEG_DIRS:
        if os.path.isdir(d):
            files += glob.glob(os.path.join(d, "**", "*.jpg"),
                               recursive=True)
    return sorted(files)


def _sof_marker(data: bytes) -> int | None:
    import struct as _struct

    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            return None
        m = data[pos + 1]
        pos += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        if m in (0xD9, 0xDA):
            return None
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        pos += _struct.unpack(">H", data[pos:pos + 2])[0]
    return None


class TestRealWorldFiles:
    """Third-party JPEGs shipped in-image (Spark mllib samples, nodejs
    docs) — files this repo's encoder did NOT produce; three are
    progressive (SOF2). Differential-validated against the JVM's
    independent javax.imageio decoder."""

    def test_all_real_files_decode(self):
        files = _real_jpegs()
        if not files:
            pytest.skip("no sample JPEGs in image")
        n_prog = 0
        for f in files:
            data = open(f, "rb").read()
            img = decode_jpeg(data)
            assert img.size > 0 and img.dtype == np.uint8
            if _sof_marker(data) == 0xC2:
                n_prog += 1
        assert n_prog >= 1, "expected progressive coverage"

    def test_pixels_match_javax_imageio(self, spark):
        files = _real_jpegs()
        if not files:
            pytest.skip("no sample JPEGs in image")
        jvm = spark._jvm
        checked_prog = 0
        for f in files:
            data = open(f, "rb").read()
            ours = decode_jpeg(data)
            img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(f))
            w, h = img.getWidth(), img.getHeight()
            assert (h, w) == ours.shape[:2]
            raster = img.getRaster()
            nb = raster.getNumBands()
            if ours.ndim == 2:
                ref = np.zeros((h, w), dtype=np.int64)
                for y in range(h):
                    ref[y] = np.array(
                        raster.getSamples(0, y, w, 1, 0, None),
                        dtype=np.int64)
                diff = np.abs(ours.astype(np.int64) - ref)
            else:
                ref = np.zeros((h, w, 3), dtype=np.int64)
                for y in range(h):
                    row = np.array(img.getRGB(0, y, w, 1, None, 0, w),
                                   dtype=np.int64)
                    ref[y, :, 0] = (row >> 16) & 0xFF
                    ref[y, :, 1] = (row >> 8) & 0xFF
                    ref[y, :, 2] = row & 0xFF
                diff = np.abs(ours.astype(np.int64) - ref)
            # IDCT/rounding/upsampling differ slightly between
            # implementations; catastrophic mis-decode would be >> 1
            assert float(diff.mean()) < 2.5, (f, float(diff.mean()))
            if _sof_marker(data) == 0xC2:
                checked_prog += 1
                assert float(diff.mean()) < 1.0, (f, float(diff.mean()))
        assert checked_prog >= 1


class TestProgressiveEncoder:
    def test_progressive_decodes_bit_identical_to_baseline(self):
        from ru_cdc_spark.functions.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(7)
        cases = [
            np.full((11, 13), 77, dtype=np.uint8),
            (np.arange(24 * 17) % 256).astype(np.uint8).reshape(24, 17),
            rng.randint(0, 256, (32, 40)).astype(np.uint8),
        ]
        for px in cases:
            for q in (50, 85, 100):
                base = decode_jpeg(encode_jpeg(px, quality=q))
                prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
                assert (base == prog).all()

    def test_progressive_stream_is_sof2_multiscan(self):
        from ru_cdc_spark.functions.jpeg import encode_jpeg_progressive

        data = encode_jpeg_progressive(
            np.full((16, 16), 90, dtype=np.uint8))
        assert b"\xff\xc2" in data
        assert data.count(b"\xff\xda") == 3  # DC first, AC, DC refine

    def test_color_input_rejected(self):
        from ru_cdc_spark.functions.jpeg import encode_jpeg_progressive

        with pytest.raises(JpegError, match="grayscale"):
            encode_jpeg_progressive(np.zeros((8, 8, 3), dtype=np.uint8))
