"""Property-based tests (hypothesis): the wildcard matcher agrees with its
SQL compilation on arbitrary inputs; type-code mapping is total; TIME
parsing matches an independent Python model on random batches."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from ru_cdc_spark.config import match_pattern, pattern_to_sql_condition
from ru_cdc_spark.functions.typemap import jdbc_type_code, mysql_type_to_spark

_chars = st.text(alphabet="ab_%'", max_size=6)
_pattern = st.one_of(
    _chars,                                                   # exact
    _chars.map(lambda s: s + "*"),                            # prefix
    _chars.map(lambda s: "*" + s),                            # suffix
    st.tuples(_chars, _chars).map(lambda t: t[0] + "*" + t[1]),  # middle
    st.just("*"),
)


@given(pattern=_pattern, value=st.text(alphabet="ab_%'", max_size=8))
@settings(max_examples=300, deadline=None)
def test_wildcard_python_sql_agree(pattern, value):
    cond = pattern_to_sql_condition(pattern, "v")
    got = duckdb.sql(
        f"SELECT {cond} FROM (SELECT ? AS v)", params=[value]
    ).fetchone()[0]
    assert bool(got) is match_pattern(pattern, value), (pattern, value, cond)


@given(t=st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_type_code_total(t):
    code = jdbc_type_code(t)
    assert isinstance(code, int)
    mysql_type_to_spark(t)  # never raises either


@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),                      # negative?
            st.integers(0, 838),                # hours
            st.integers(0, 59), st.integers(0, 59),
            st.one_of(st.none(), st.integers(0, 999999)),  # frac micros
        ),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_time_parse_matches_model(spark, rows):
    from pyspark.sql import functions as F

    from ru_cdc_spark.functions.mysql_types import time_to_microseconds

    def fmt(neg, h, m, s, frac):
        base = f"{'-' if neg else ''}{h:02d}:{m:02d}:{s:02d}"
        if frac is not None:
            base += f".{frac:06d}"
        return base

    def model(neg, h, m, s, frac):
        us = (h * 3600 + m * 60 + s) * 1_000_000 + (frac or 0)
        return -us if neg else us

    texts = [(fmt(*r),) for r in rows]
    expected = [model(*r) for r in rows]
    df = spark.createDataFrame(texts, ["t"])
    got = [r["us"] for r in
           df.select(time_to_microseconds(F.col("t")).alias("us")).collect()]
    assert got == expected


@given(
    ops=st.lists(
        st.tuples(
            st.integers(1, 5),                 # pk
            st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
            st.integers(0, 999),               # value payload
        ),
        min_size=1, max_size=12,
    ),
    data=st.data(),
)
@settings(max_examples=8, deadline=None)
def test_merge_versioned_order_independent(spark, ops, data):
    """The version-guarded merge converges to the same snapshot no matter
    how the change stream is permuted across micro-batches — the tombstone
    + seq-guard guarantee (the reference would corrupt under reorder; this
    is the documented fix)."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.operators.merge import merge_versioned, snapshot_view

    seq_ops = list(enumerate(ops))  # (seq, (pk, type, val))
    perm = data.draw(st.permutations(seq_ops))
    n_splits = data.draw(st.integers(1, min(3, len(perm))))
    bounds = sorted(data.draw(
        st.lists(st.integers(0, len(perm)), min_size=n_splits - 1,
                 max_size=n_splits - 1)))
    batches, prev = [], 0
    for b in bounds + [len(perm)]:
        batches.append(perm[prev:b]); prev = b

    def to_df(items):
        rows = [
            (seq, typ,
             {"pk": pk, "v": val} if typ != "INSERT" else None,
             {"pk": pk, "v": val} if typ != "DELETE" else None)
            for seq, (pk, typ, val) in items
        ]
        return spark.createDataFrame(
            rows, "id long, type string, "
                  "before struct<pk:long,v:long>, after struct<pk:long,v:long>")

    snap = None
    for batch in batches:
        if batch:
            snap = merge_versioned(snap, to_df(batch), ["pk"])
    got = {(r.pk, r.v) for r in snapshot_view(snap).collect()}

    ordered = None
    for seq, op in sorted(seq_ops):
        ordered = merge_versioned(ordered, to_df([(seq, op)]), ["pk"])
    want = {(r.pk, r.v) for r in snapshot_view(ordered).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# binlog wire codec roundtrip properties (sources/binlog_wire.py)
# ---------------------------------------------------------------------------

from datetime import date, datetime  # noqa: E402
from decimal import Decimal  # noqa: E402

from ru_cdc_spark.sources import binlog_wire as bw  # noqa: E402


@given(raw=st.integers(min_value=-(10**12 - 1) // 1, max_value=10**12 - 1))
@settings(max_examples=300, deadline=None)
def test_decimal_roundtrip_property(raw):
    # DECIMAL(12,4): any 12-digit scaled integer survives encode/decode
    v = Decimal(raw).scaleb(-4)
    got, _ = bw.decode_decimal(bw.encode_decimal(v, 12, 4), 0, 12, 4)
    assert got == v


@given(
    h=st.integers(min_value=0, max_value=838),
    m=st.integers(min_value=0, max_value=59),
    s=st.integers(min_value=0, max_value=59),
    ms=st.integers(min_value=0, max_value=999),
    neg=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_time2_roundtrip_property(h, m, s, ms, neg):
    us = (h * 3600 + m * 60 + s) * 1_000_000 + ms * 1000
    if neg:
        us = -(us - ms * 1000)  # negative whole-second form
    got, _ = bw.decode_time2(bw.encode_time2(us, 3), 0, 3)
    assert got == us


@given(
    y=st.integers(min_value=1000, max_value=9999),
    mo=st.integers(min_value=1, max_value=12),
    d=st.integers(min_value=1, max_value=28),
    hh=st.integers(min_value=0, max_value=23),
    mm=st.integers(min_value=0, max_value=59),
    ss=st.integers(min_value=0, max_value=59),
    us=st.integers(min_value=0, max_value=999_999),
)
@settings(max_examples=300, deadline=None)
def test_datetime2_roundtrip_property(y, mo, d, hh, mm, ss, us):
    dt = datetime(y, mo, d, hh, mm, ss, us)
    got, _ = bw.decode_datetime2(bw.encode_datetime2(dt, 6), 0, 6)
    assert got == dt


@given(y=st.integers(min_value=1000, max_value=9999),
       mo=st.integers(min_value=1, max_value=12),
       d=st.integers(min_value=1, max_value=28))
@settings(max_examples=200, deadline=None)
def test_date_roundtrip_property(y, mo, d):
    dd = date(y, mo, d)
    got, _ = bw.decode_date(bw.encode_date(dd), 0)
    assert got == dd


_int_specs = [
    (bw.T_TINY, -128, 127), (bw.T_SHORT, -32768, 32767),
    (bw.T_INT24, -(1 << 23), (1 << 23) - 1),
    (bw.T_LONG, -(1 << 31), (1 << 31) - 1),
    (bw.T_LONGLONG, -(1 << 63), (1 << 63) - 1),
]


@given(idx=st.integers(min_value=0, max_value=len(_int_specs) - 1),
       data=st.data())
@settings(max_examples=300, deadline=None)
def test_integer_roundtrip_property(idx, data):
    t, lo, hi = _int_specs[idx]
    v = data.draw(st.integers(min_value=lo, max_value=hi))
    spec = bw.ColSpec(t)
    got, _ = bw.decode_value(bw.encode_value(v, spec), 0, spec)
    assert got == v


@given(s=st.text(max_size=300), wide=st.booleans())
@settings(max_examples=200, deadline=None)
def test_string_roundtrip_property(s, wide):
    # utf-8 byte length drives the prefix; 2-byte prefix when meta > 255
    spec = bw.ColSpec(bw.T_VARCHAR, (300 if wide else 200,))
    if len(s.encode()) > (255 if not wide else 65535):
        return
    got, _ = bw.decode_value(bw.encode_value(s, spec), 0, spec)
    assert got == s


@given(bits=st.integers(min_value=1, max_value=64), data=st.data())
@settings(max_examples=200, deadline=None)
def test_bit_roundtrip_property(bits, data):
    v = data.draw(st.integers(min_value=0, max_value=(1 << bits) - 1))
    spec = bw.ColSpec(bw.T_BIT, (bits,))
    got, off = bw.decode_value(bw.encode_value(v, spec), 0, spec)
    assert got == v and off == (bits + 7) // 8


@given(width=st.integers(min_value=1, max_value=2), data=st.data())
@settings(max_examples=200, deadline=None)
def test_enum_set_roundtrip_property(width, data):
    v = data.draw(st.integers(min_value=0, max_value=(1 << 8 * width) - 1))
    for t in (bw.T_ENUM, bw.T_SET):
        spec = bw.ColSpec(t, (width,))
        got, _ = bw.decode_value(bw.encode_value(v, spec), 0, spec)
        assert got == v


@given(gno=st.integers(min_value=1, max_value=(1 << 62)),
       lc=st.integers(min_value=0, max_value=(1 << 62)),
       sn=st.integers(min_value=0, max_value=(1 << 62)),
       sid=st.binary(min_size=16, max_size=16),
       flag=st.integers(min_value=0, max_value=1))
@settings(max_examples=200, deadline=None)
def test_gtid_roundtrip_property(gno, lc, sn, sid, flag):
    g = bw.decode_gtid(bw.encode_gtid(sid, gno, lc, sn, flag))
    assert g == {"commit_flag": flag, "sid": sid, "gno": gno,
                 "last_committed": lc, "sequence_number": sn}


@given(sql=st.text(max_size=200), schema=st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_query_event_roundtrip_property(sql, schema):
    if len(schema.encode()) > 255:
        return
    assert bw.decode_query(bw.encode_query(sql, schema)) == (schema, sql)


@given(xid=st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=200, deadline=None)
def test_xid_roundtrip_property(xid):
    assert bw.decode_xid(bw.encode_xid(xid)) == xid


class TestJpegProperty:
    """Hypothesis roundtrips for the baseline JPEG codec: arbitrary
    dims and content decode to the right shape with bounded error."""

    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
        sub=st.sampled_from(["444", "420"]),
    )
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_shape_and_bounded_error(self, h, w, seed, sub):
        import numpy as np

        from ru_cdc_spark.functions.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        # smooth-ish content (random walk) — JPEG's target domain
        base = rng.integers(0, 256, (1, 1, 3))
        steps = rng.integers(-6, 7, (h, w, 3))
        img = np.clip(base + np.cumsum(np.cumsum(steps, 0), 1),
                      0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 16

    @given(
        n=st.integers(min_value=0, max_value=500),
        ch=st.integers(min_value=1, max_value=2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_wav_roundtrip_bit_exact(self, n, ch, rate, seed):
        import numpy as np

        from ru_cdc_spark.functions.wav import decode_wav, encode_wav

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert out.shape == (n, ch)
        assert np.array_equal(out, s)


class TestKafkaCodecProperty:
    @given(
        recs=st.lists(
            st.tuples(
                st.one_of(st.none(), st.binary(max_size=40)),
                st.binary(max_size=200)),
            min_size=1, max_size=50),
        base=st.integers(min_value=0, max_value=2**40),
        comp=st.sampled_from(["none", "gzip"]),
    )
    @settings(max_examples=50, deadline=None)
    def test_record_batch_roundtrip(self, recs, base, comp):
        from ru_cdc_spark.sources.kafka_wire import (
            decode_record_batches,
            encode_record_batch,
        )

        blob = encode_record_batch(recs, base_offset=base,
                                   compression=comp)
        out = decode_record_batches(blob)
        assert len(out) == 1
        assert out[0]["crc_ok"]
        assert out[0]["base_offset"] == base
        assert [(k, v) for _, k, v in out[0]["records"]] == recs
        assert [o for o, _, _ in out[0]["records"]] == \
            list(range(base, base + len(recs)))


class TestSnappyProperty:
    @given(data=st.binary(max_size=5000))
    @settings(max_examples=80, deadline=None)
    def test_raw_roundtrip(self, data):
        from ru_cdc_spark.functions.snappy import (
            snappy_compress,
            snappy_decompress,
        )

        assert snappy_decompress(snappy_compress(data)) == data

    @given(data=st.binary(max_size=3000),
           rep=st.integers(min_value=1, max_value=40))
    @settings(max_examples=40, deadline=None)
    def test_xerial_roundtrip_repetitive(self, data, rep):
        from ru_cdc_spark.functions.snappy import (
            xerial_compress,
            xerial_decompress,
        )

        blob = data * rep
        assert xerial_decompress(xerial_compress(blob)) == blob


class TestLz4Property:
    @given(data=st.binary(max_size=5000))
    @settings(max_examples=80, deadline=None)
    def test_block_roundtrip(self, data):
        from ru_cdc_spark.functions.lz4 import (
            lz4_block_compress,
            lz4_block_decompress,
        )

        assert lz4_block_decompress(lz4_block_compress(data)) == data

    @given(data=st.binary(max_size=2000),
           rep=st.integers(min_value=1, max_value=60))
    @settings(max_examples=40, deadline=None)
    def test_frame_roundtrip(self, data, rep):
        from ru_cdc_spark.functions.lz4 import (
            lz4_frame_compress,
            lz4_frame_decompress,
        )

        blob = data * rep
        assert lz4_frame_decompress(lz4_frame_compress(blob)) == blob


class TestAvroProperty:
    @given(
        vid=st.integers(min_value=-(2**62), max_value=2**62),
        name=st.one_of(st.none(), st.text(max_size=30)),
        price=st.one_of(st.none(),
                        st.floats(allow_nan=False, allow_infinity=False,
                                  width=64)),
        flag=st.one_of(st.none(), st.booleans()),
        blob=st.one_of(st.none(), st.binary(max_size=50)),
        days=st.integers(min_value=-30000, max_value=30000),
        micros=st.integers(min_value=-(2**50), max_value=2**50),
    )
    @settings(max_examples=100, deadline=None)
    def test_record_roundtrip(self, vid, name, price, flag, blob,
                              days, micros):
        from datetime import date, datetime, timedelta

        from pyspark.sql import types as T
        from ru_cdc_spark.sources.avro_cdc import (
            avro_decode,
            avro_encode,
            avro_schema_of,
        )

        schema_t = T.StructType([
            T.StructField("vid", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("price", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("d", T.DateType(), False),
            T.StructField("ts", T.TimestampNTZType(), False),
        ])
        sch = avro_schema_of(schema_t)
        rec = {"vid": vid, "name": name, "price": price, "flag": flag,
               "blob": blob,
               "d": date(1970, 1, 1) + timedelta(days=days),
               "ts": datetime(1970, 1, 1)
               + timedelta(microseconds=micros)}
        out = avro_decode(sch, avro_encode(sch, rec))
        assert out == rec
