"""Differential codec validation (round-4 verdict: per codec, at least
one test whose expected bytes did NOT originate from this repo's
encoder). pyarrow bundles the reference C implementations of snappy,
LZ4 (raw block + frame), gzip, and zstd — an independent authorship
chain — so both directions are checked against it:

* our DECODER consumes pyarrow-compressed bytes;
* our ENCODER's output is consumed by pyarrow.

This breaks the decode-what-you-encode circularity that a shared
misreading of a spec could otherwise survive.
"""

from __future__ import annotations

import random

import pytest

pa = pytest.importorskip("pyarrow")

from ru_cdc_spark.functions.lz4 import (  # noqa: E402
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
)
from ru_cdc_spark.functions.snappy import (  # noqa: E402
    snappy_compress,
    snappy_decompress,
)

rnd = random.Random(20240815)
WORDS = [bytes(rnd.randbytes(rnd.randint(2, 11))) for _ in range(300)]
CASES = [
    b"",
    b"x",
    b"A" * 10_000,
    b" ".join(rnd.choice(WORDS) for _ in range(5_000)),
    bytes(rnd.randbytes(50_000)),                       # incompressible
    b"".join(WORDS[i % 17] * (i % 5 + 1) for i in range(2_000)),
]


@pytest.mark.parametrize("i", range(len(CASES)))
class TestSnappyDifferential:
    def test_decode_reference_compressed(self, i):
        plain = CASES[i]
        comp = pa.Codec("snappy").compress(plain).to_pybytes()
        assert snappy_decompress(comp) == plain

    def test_reference_decodes_our_encoder(self, i):
        plain = CASES[i]
        comp = snappy_compress(plain)
        got = pa.Codec("snappy").decompress(comp, len(plain)).to_pybytes()
        assert got == plain


@pytest.mark.parametrize("i", range(len(CASES)))
class TestLz4BlockDifferential:
    def test_decode_reference_compressed(self, i):
        plain = CASES[i]
        comp = pa.Codec("lz4_raw").compress(plain).to_pybytes()
        assert lz4_block_decompress(comp) == plain

    def test_reference_decodes_our_encoder(self, i):
        plain = CASES[i]
        comp = lz4_block_compress(plain)
        got = pa.Codec("lz4_raw").decompress(comp,
                                             len(plain)).to_pybytes()
        assert got == plain


@pytest.mark.parametrize("i", range(len(CASES)))
class TestLz4FrameDifferential:
    def test_decode_reference_compressed(self, i):
        plain = CASES[i]
        comp = pa.Codec("lz4").compress(plain).to_pybytes()
        assert lz4_frame_decompress(comp) == plain

    def test_reference_decodes_our_encoder(self, i):
        plain = CASES[i]
        comp = lz4_frame_compress(plain)
        got = pa.Codec("lz4").decompress(comp, len(plain)).to_pybytes()
        assert got == plain
