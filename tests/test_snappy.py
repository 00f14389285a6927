"""Pure-Python snappy codec: raw block format + xerial framing."""

from __future__ import annotations

import os
import struct

import pytest

from ru_cdc_spark.functions.snappy import (
    SnappyError,
    snappy_compress,
    snappy_decompress,
    xerial_compress,
    xerial_decompress,
)


class TestRawBlock:
    @pytest.mark.parametrize("data", [
        b"", b"a", b"abcd", b"hello world " * 100,
        b"\x00" * 70000, bytes(range(256)) * 300,
    ])
    def test_roundtrip(self, data):
        assert snappy_decompress(snappy_compress(data)) == data

    def test_random_roundtrip(self):
        for seed in range(5):
            data = os.urandom(1000 * (seed + 1))
            assert snappy_decompress(snappy_compress(data)) == data

    def test_repetitive_actually_compresses(self):
        data = b"the quick brown fox " * 500
        assert len(snappy_compress(data)) < len(data) // 5

    def test_overlapping_copy_decodes(self):
        """offset < length = RLE-style self-referential copy — the
        format requires byte-wise semantics."""
        # literal 'ab' then copy(offset=2, len=8) -> 'abababababab'... hand-built
        block = bytes([10]) + bytes([1 << 2]) + b"ab" \
            + bytes([0x02 | (7 << 2)]) + (2).to_bytes(2, "little")
        assert snappy_decompress(block) == b"ab" + b"ab" * 4

    def test_length_mismatch_rejected(self):
        comp = bytearray(snappy_compress(b"hello world"))
        comp[0] += 1  # claim one more byte than the stream yields
        with pytest.raises(SnappyError):
            snappy_decompress(bytes(comp))

    def test_bad_offset_rejected(self):
        block = bytes([4]) + bytes([0x02 | (3 << 2)]) \
            + (9).to_bytes(2, "little")
        with pytest.raises(SnappyError, match="offset"):
            snappy_decompress(block)


class TestXerial:
    def test_framing_magic(self):
        x = xerial_compress(b"data")
        assert x[:8] == b"\x82SNAPPY\x00"
        assert struct.unpack(">ii", x[8:16]) == (1, 1)

    @pytest.mark.parametrize("n", [0, 1, 100, 40_000, 100_000])
    def test_roundtrip_across_block_boundaries(self, n):
        data = (b"0123456789" * (n // 10 + 1))[:n]
        assert xerial_decompress(xerial_compress(data)) == data

    def test_raw_fallback(self):
        """Producers occasionally ship RAW snappy without the wrapper —
        decompress must accept both, like brokers do."""
        data = b"fallback " * 50
        assert xerial_decompress(snappy_compress(data)) == data
