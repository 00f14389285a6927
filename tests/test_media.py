"""WAV and MJPEG-AVI codecs (functions/wav.py, functions/avi.py) and
the all-modality real-decode dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from ru_cdc_spark.functions.avi import AviError, encode_avi, parse_avi, sample_frames
from ru_cdc_spark.functions.jpeg import encode_jpeg
from ru_cdc_spark.functions.wav import (
    WavError,
    audio_features,
    decode_wav,
    encode_wav,
)


class TestWav:
    def test_stereo_16bit_bit_exact(self):
        rng = np.random.default_rng(3)
        s = rng.integers(-30000, 30000, (1000, 2), dtype=np.int16)
        out, rate = decode_wav(encode_wav(s, 22050))
        assert rate == 22050
        assert np.array_equal(out, s)

    def test_mono_8bit(self):
        s = np.arange(256, dtype=np.uint8)
        out, rate = decode_wav(encode_wav(s, 8000, bits=8))
        assert rate == 8000
        assert np.array_equal(out[:, 0], s)

    def test_riff_structure(self):
        data = encode_wav(np.zeros(10, dtype=np.int16), 16000)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        assert b"fmt " in data and b"data" in data

    def test_non_pcm_rejected(self):
        data = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
        i = data.index(b"fmt ") + 8
        data[i] = 3  # IEEE float format tag
        with pytest.raises(WavError, match="PCM"):
            decode_wav(bytes(data))

    def test_not_wave_rejected(self):
        with pytest.raises(WavError):
            decode_wav(b"RIFF\x00\x00\x00\x00AVI mystery")

    def test_features_exact(self):
        # +v / -v square wave: exact integer energy and crossing count
        v, n = 500, 100
        s = np.tile(np.array([v] * 5 + [-v] * 5, dtype=np.int16), n // 10)
        f = audio_features(s[:, None], 10000)
        assert f["n_samples"] == n and f["channels"] == 1
        assert f["duration_ms"] == 10
        assert f["peak"] == v
        assert f["energy"] == n * v * v
        assert f["zero_crossings"] == n // 5 - 1


class TestAvi:
    def _frames(self, vals, w=24, h=16):
        return [encode_jpeg(np.full((h, w), v, dtype=np.uint8), 100)
                for v in vals]

    def test_container_roundtrip(self):
        avi = encode_avi(self._frames([50, 60, 70, 80, 90]), 24, 16,
                         fps=5)
        meta = parse_avi(avi)
        assert (meta["width"], meta["height"]) == (24, 16)
        assert meta["fps"] == 5 and meta["n_frames"] == 5
        assert len(meta["frames"]) == 5

    def test_sampling_decodes_only_picked_frames(self):
        avi = encode_avi(self._frames([50, 60, 70, 80, 90]), 24, 16)
        px = sample_frames(avi, every_k=2)
        assert [int(p[0, 0]) for p in px] == [50, 70, 90]
        px = sample_frames(avi, every_k=2, max_frames=2)
        assert len(px) == 2

    def test_non_mjpeg_rejected(self):
        avi = bytearray(encode_avi(self._frames([1]), 24, 16))
        i = avi.index(b"vidsMJPG") + 4
        avi[i:i + 4] = b"H264"
        with pytest.raises(AviError, match="MJPG"):
            parse_avi(bytes(avi))

    def test_not_avi_rejected(self):
        with pytest.raises(AviError):
            parse_avi(encode_wav(np.zeros(4, dtype=np.int16)))


class TestAllModalityDispatch:
    def test_decode_payload_real_for_all_four(self):
        from ru_cdc_spark.functions.png import encode_png
        from ru_cdc_spark.operators.multimodal import decode_payload

        img = np.full((9, 11), 77, dtype=np.uint8)
        assert decode_payload(encode_png(img), "image") == {
            "width": 11, "height": 9, "n_frames": 1}
        assert decode_payload(encode_jpeg(img, 100), "image") == {
            "width": 11, "height": 9, "n_frames": 1}
        wav = encode_wav(np.zeros((50, 2), dtype=np.int16), 16000)
        assert decode_payload(wav, "audio") == {
            "width": 2, "height": 50, "n_frames": 1}
        avi = encode_avi([encode_jpeg(img, 100)] * 3, 11, 9)
        assert decode_payload(avi, "video") == {
            "width": 11, "height": 9, "n_frames": 3}

    def test_unknown_format_still_gated(self):
        from ru_cdc_spark.operators.multimodal import decode_payload

        with pytest.raises(NotImplementedError):
            decode_payload(b"\x00unknown bytes", "audio")
        fake = decode_payload(b"\x00unknown bytes", "audio", fake=True)
        assert set(fake) == {"width", "height", "n_frames"}


class TestAudioSpectral:
    def test_peak_bin_is_synthesis_bin(self):
        import numpy as np

        from ru_cdc_spark.functions.wav import decode_wav, encode_wav
        from ru_cdc_spark.operators.multimodal import (
            AUDIO_SPECTRAL_N,
            AUDIO_SPECTRAL_RATE,
        )

        n, t = AUDIO_SPECTRAL_N, np.arange(256)
        for k in (2, 17, 63, 101, 127):
            s = np.round(12000.0 * np.sin(2 * np.pi * k * t / n)) \
                .astype(np.int16).reshape(n, 1)
            out, rate = decode_wav(encode_wav(s, AUDIO_SPECTRAL_RATE))
            spec = np.abs(np.fft.rfft(out[:, 0].astype(np.float64)))
            assert int(np.argmax(spec[1:]) + 1) == k

    def test_two_tone_picks_dominant(self):
        import numpy as np

        t = np.arange(256)
        s = (10000.0 * np.sin(2 * np.pi * 40 * t / 256)
             + 3000.0 * np.sin(2 * np.pi * 90 * t / 256))
        spec = np.abs(np.fft.rfft(s))
        assert int(np.argmax(spec[1:]) + 1) == 40
