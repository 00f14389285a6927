"""Partial row images end-to-end (binlog_row_image=MINIMAL/NOBLOB):
sparse wire decode -> presence-flagged change stream -> per-column
latest-present merge. The acceptance bar: the MINIMAL and NOBLOB
pipelines reconstruct EXACTLY the table the FULL-image pipeline yields
(the reference can't — it assumes full images, binlog.rs:646-667)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.merge import merge_sparse_changes
from ru_cdc_spark.sources.binlog_frames import (
    SPARSE_EMIT_COLS,
    decode_cdc_frames,
    decode_sparse_cdc_frames,
    generate_cdc_frames,
    generate_sparse_cdc_frames,
)

N = 400  # covers several null-cycle (13) and op-discipline (10) periods
VALUE_COLS = [n for n, _ in SPARSE_EMIT_COLS]


def _merged_sparse(spark, mode):
    changes = decode_sparse_cdc_frames(
        generate_sparse_cdc_frames(spark, N, mode=mode).select("frame"))
    return merge_sparse_changes(changes, ["i"], VALUE_COLS,
                                seq_col="seq", type_col="type")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minimal_equals_full_image_merge(spark):
    # the FULL-image pipeline (binlog_wire_cdc_snapshot's shape), plus
    # t_text which the sparse pipeline also carries
    full = decode_cdc_frames(generate_cdc_frames(spark, N).select("frame"))
    row = F.struct(*[F.col(c) for c in full.columns])
    full_snapshot = (
        full.groupBy("i").agg(F.max_by(row, F.col("seq")).alias("r"))
        .select("r.*").where(F.col("type") != "DELETE")
        .select("i", "t_long", "t_dec", "t_varchar", "t_datetime"))
    minimal = _merged_sparse(spark, "MINIMAL").select(
        "i", "t_long", "t_dec", "t_varchar", "t_datetime")
    assert _rows(minimal) == _rows(full_snapshot)


def test_noblob_equals_minimal_snapshot(spark):
    assert _rows(_merged_sparse(spark, "NOBLOB")) == \
        _rows(_merged_sparse(spark, "MINIMAL"))


def test_unchanged_text_column_survives_sparse_updates(spark):
    # t_text is never in any UPDATE image; the merged value must be the
    # INSERT's — an all-columns latest-wins merge would null it out
    out = _merged_sparse(spark, "MINIMAL")
    bad = out.where(F.col("t_text") != F.concat(
        F.lit("t"), (F.col("i") * 3).cast("string"))).count()
    assert bad == 0
    updated = out.where(F.col("i") % 10 < 3)
    assert updated.where(F.col("t_varchar") !=
                         F.concat(F.lit("upd_"), F.col("i"))).count() == 0


def test_sparse_update_presence_flags(spark):
    ch = decode_sparse_cdc_frames(
        generate_sparse_cdc_frames(spark, 100, mode="MINIMAL")
        .select("frame"))
    upd = ch.where(F.col("type") == "UPDATE")
    # MINIMAL updates carry ONLY the changed columns
    assert upd.where(~F.col("t_long_present") |
                     ~F.col("t_varchar_present")).count() == 0
    assert upd.where(F.col("t_dec_present") | F.col("t_text_present") |
                     F.col("t_datetime_present")).count() == 0
    ins = ch.where(F.col("type") == "INSERT")
    assert ins.where(~F.col("t_long_present") | ~F.col("t_text_present")
                     ).count() == 0


def test_merge_sparse_changes_semantics(spark):
    # hand-built stream: present-NULL overwrites, ABSENT never does,
    # DELETE drops, DELETE->re-INSERT resurrects with the new image
    rows = [
        # pk 1: insert v=10, sparse update leaves v absent but sets w
        (1, "INSERT", 1, 10, True, "a", True),
        (2, "UPDATE", 1, None, False, "b", True),
        # pk 2: present NULL overwrite of v
        (1, "INSERT", 2, 20, True, "x", True),
        (2, "UPDATE", 2, None, True, None, False),
        # pk 3: deleted
        (1, "INSERT", 3, 30, True, "z", True),
        (2, "DELETE", 3, None, False, None, False),
        # pk 4: delete then re-insert — new image wins, old must not leak
        (1, "INSERT", 4, 40, True, "old", True),
        (2, "DELETE", 4, None, False, None, False),
        (3, "INSERT", 4, 44, True, "new", True),
    ]
    df = spark.createDataFrame(
        rows, "seq long, type string, pk long, v long, v_present boolean, "
              "w string, w_present boolean")
    out = merge_sparse_changes(df, ["pk"], ["v", "w"],
                               seq_col="seq", type_col="type")
    got = {r["pk"]: (r["v"], r["w"]) for r in out.collect()}
    assert got == {1: (10, "b"), 2: (None, "x"), 4: (44, "new")}


def test_sparse_merge_plan_single_pk_shuffle(spark):
    # ONE pk exchange with map-side partial aggregation before it, no
    # window — the same scale shape as latest_changes. (String-valued
    # max_by buffers make Spark pick SortAggregate over HashAggregate;
    # the properties that matter at 100 TB — single shuffle, one row
    # per (key, map task) crossing it — hold either way.)
    out = _merged_sparse(spark, "MINIMAL")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # the pk agg
    assert "Window" not in plan
    assert "partial_max_by" in plan  # map-side collapse before the shuffle


def test_window_dedup_survives_minimal_images():
    """A MINIMAL-configured server's UPDATE after-image has no pk (it
    travels in the before image): the incremental snapshot's window
    dedup must key on the before image and never trip over ABSENT."""
    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        ColSpec,
        T_LONG,
        T_LONGLONG,
        UPDATE_ROWS_V2,
        encode_rows_event,
        encode_table_map,
    )
    from ru_cdc_spark.sources.incremental_snapshot import (
        _window_touched_pks,
    )

    specs = [ColSpec(T_LONGLONG), ColSpec(T_LONG)]
    tm = encode_table_map(9, "app", "snaptab", specs)
    ev = encode_rows_event(
        UPDATE_ROWS_V2, 9, specs,
        [((7, ABSENT), (ABSENT, 42))],
        present=[True, False], present_after=[False, True])
    touched = _window_touched_pks([(0, tm), (1, ev)], "snaptab",
                                  lo=-1, hi=100)
    assert touched == {7}


def test_minimal_images_over_socket_with_crc32(spark):
    """binlog_checksum=CRC32 + binlog_row_image=MINIMAL together (the
    stock MySQL 8 checksum default meeting the write-heavy row-image
    config): the socket reader must verify+strip the trailer BEFORE the
    sparse decode — a CRC parsed as image bytes would corrupt the
    present-column walk."""
    from ru_cdc_spark.sources.mysql_fixture_server import (
        MySQLFixtureServer,
        VirtualBinlog,
    )
    from ru_cdc_spark.sources.mysql_socket_source import socket_cdc_frames

    srv = MySQLFixtureServer(
        binlog=VirtualBinlog.from_cdc_fixture(200, crc32=True,
                                              row_image="MINIMAL")).start()
    try:
        frames = socket_cdc_frames(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password, n_slices=4)
        changes = decode_sparse_cdc_frames(frames.select("frame"))
        merged = merge_sparse_changes(changes, ["i"], VALUE_COLS,
                                      seq_col="seq", type_col="type")
        # identical final state to the checksum-free generator pipeline
        want200 = merge_sparse_changes(
            decode_sparse_cdc_frames(
                generate_sparse_cdc_frames(spark, 200, mode="MINIMAL")
                .select("frame")),
            ["i"], VALUE_COLS, seq_col="seq", type_col="type")
        assert _rows(merged) == _rows(want200)
    finally:
        srv.stop()


def test_whole_row_bootstrap_decode_rejects_partial_images(spark):
    """The streaming-bootstrap decoder feeds the whole-row versioned
    merge, which cannot express 'column unknown': a MINIMAL-image frame
    must fail loudly, pointing at the sparse pipeline — not stringify
    the ABSENT sentinel into the snapshot."""
    import pytest as _pytest

    from ru_cdc_spark.sources.binlog_wire import (
        ABSENT,
        ColSpec,
        T_LONG,
        T_LONGLONG,
        UPDATE_ROWS_V2,
        encode_frame,
    )
    from ru_cdc_spark.sources.incremental_snapshot import (
        decode_table_frames,
    )

    specs = [ColSpec(T_LONGLONG), ColSpec(T_LONG)]
    frame = encode_frame(9, "app", "snaptab", specs, UPDATE_ROWS_V2,
                         [((7, ABSENT), (ABSENT, 42))],
                         present=[True, False],
                         present_after=[False, True])
    df = spark.createDataFrame([(4, bytearray(frame))],
                               "pos long, frame binary")
    out = decode_table_frames(df, "snaptab", ["id", "val"])
    with _pytest.raises(Exception, match="partial row image"):
        out.collect()
