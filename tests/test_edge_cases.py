"""Empty-input and degenerate-case behavior for core operators (the class
of bug the empty-instances route crash came from)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ru_cdc_spark.operators.envelope import build_envelope
from ru_cdc_spark.operators.merge import apply_changes, merge_versioned, snapshot_view
from ru_cdc_spark.operators.dedup import connected_components
from ru_cdc_spark.operators.joins import asof_join
from ru_cdc_spark.sources.cdc_fixture import (
    ORDERS_DATABASE,
    ORDERS_MYSQL_TYPES,
    ORDERS_PK,
    ORDERS_TABLE,
    derive_order_changes,
)


def test_empty_change_stream_pipelines(spark, sf_dir):
    empty = derive_order_changes(spark, sf_dir).limit(0)
    env = build_envelope(empty, ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK,
                         ORDERS_MYSQL_TYPES, processing_ts=F.lit(0))
    assert env.count() == 0
    assert apply_changes(empty, ORDERS_PK).count() == 0
    snap = merge_versioned(None, empty, ORDERS_PK)
    assert snapshot_view(snap).count() == 0


def test_merge_versioned_none_then_batch(spark, sf_dir):
    ch = derive_order_changes(spark, sf_dir).limit(30)
    snap = merge_versioned(None, ch, ORDERS_PK)
    # applying the SAME batch again is a no-op (idempotent replay)
    again = merge_versioned(snap, ch, ORDERS_PK)
    assert snap.count() == again.count()
    assert snap.exceptAll(again).count() == 0


def test_scd2_history_semantics(spark, sf_dir):
    """SCD2 over the fixture change stream: updated keys carry a closed
    INSERT version plus an open UPDATE version; deleted keys keep their
    closed history with NO current row; untouched keys are a single
    open version. Consistency: current rows == the latest-wins merge."""
    from ru_cdc_spark.operators.merge import scd2_history

    changes = derive_order_changes(spark, sf_dir)
    hist = scd2_history(changes, ORDERS_PK)
    rows = hist.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.o_orderkey, []).append(r)

    assert by_key  # non-empty corpus
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from_seq)
        mod = k % 10
        if mod < 3:  # INSERT then UPDATE
            assert len(vs) == 2
            assert vs[0].valid_to_seq == vs[1].valid_from_seq
            assert vs[1].is_current and vs[1].valid_to_seq is None
            assert not vs[0].is_current
        elif mod == 3:  # INSERT then DELETE: history, no current row
            assert len(vs) == 1
            assert vs[0].valid_to_seq == k * 3 + 2
            assert not vs[0].is_current
        else:  # lone INSERT stays open
            assert len(vs) == 1 and vs[0].is_current

    current = {(r.o_orderkey, str(r.o_totalprice)) for r in rows
               if r.is_current}
    merged = {(r.o_orderkey, str(r.o_totalprice))
              for r in apply_changes(changes, ORDERS_PK).collect()}
    assert current == merged

    # empty stream degenerates cleanly
    assert scd2_history(changes.limit(0), ORDERS_PK).count() == 0


def test_connected_components_edge_cases(spark):
    # empty edge set
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
    # self-loop and a 2-chain
    edges = spark.createDataFrame([(1, 1), (2, 3), (3, 4)], ["src", "dst"])
    comp = {r["doc_id"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp[1] == 1
    assert comp[2] == comp[3] == comp[4] == 2


def test_asof_join_no_right_rows(spark):
    left = spark.createDataFrame([(1, 10, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame([], "k long, rt long, payload long")
    out = asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                    payload_cols=["payload"], left_id="event_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["payload"] is None


def test_envelope_single_row_update_no_change(spark):
    """An UPDATE whose before == after yields an empty old map (no
    changed columns) — the diff must not fabricate entries."""
    ch = spark.createDataFrame(
        [(1, "UPDATE", 0, (5, "x"), (5, "x"))],
        "id long, type string, es long, "
        "before struct<k:long, v:string>, after struct<k:long, v:string>",
    )
    env = build_envelope(ch, "db", "t", ["k"],
                         {"k": "bigint(20)", "v": "varchar(10)"},
                         processing_ts=F.lit(0))
    row = env.collect()[0]
    assert row["old"] is not None and row["old"][0] == {}


def test_star_contraction_matches_label_propagation(spark):
    from ru_cdc_spark.operators.dedup import star_contraction_components

    import random
    rng = random.Random(7)
    # adversarial shapes for contraction algorithms: a long chain (high
    # diameter), a star, a cycle, plus random noise edges
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(0, i) for i in range(1, 8)]
    cycle = [(200 + i, 200 + (i + 1) % 9) for i in range(9)]
    noise = [(rng.randrange(300, 330), rng.randrange(300, 330)) for _ in range(25)]
    edges = spark.createDataFrame(chain + star + cycle + noise, ["src", "dst"])

    # all FOUR paths must agree: label propagation and star contraction,
    # each with the driver-side union-find finish (default) and forced
    # fully-distributed (driver_finish_edges=0)
    lp = {r["doc_id"]: r["component"]
          for r in connected_components(edges, max_iterations=60).collect()}
    lp_dist = {r["doc_id"]: r["component"]
               for r in connected_components(
                   edges, max_iterations=60,
                   driver_finish_edges=0).collect()}
    sc = {r["doc_id"]: r["component"]
          for r in star_contraction_components(edges).collect()}
    sc_dist = {r["doc_id"]: r["component"]
               for r in star_contraction_components(
                   edges, driver_finish_edges=0).collect()}
    assert lp == sc == lp_dist == sc_dist


def test_star_contraction_mid_round_driver_finish(spark):
    """The hybrid escape INSIDE the round loop: a graph above the
    threshold initially but below it after one contraction round must
    produce identical components to the fully-distributed run."""
    from ru_cdc_spark.operators.dedup import star_contraction_components

    # 60 disjoint 3-chains: 120 edges, contracts to 60 stars quickly
    edges = []
    for k in range(60):
        base = 1000 * (k + 1)
        edges += [(base, base + 1), (base + 1, base + 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    full = {r["doc_id"]: r["component"]
            for r in star_contraction_components(
                df, driver_finish_edges=0).collect()}
    hybrid = {r["doc_id"]: r["component"]
              for r in star_contraction_components(
                  df, driver_finish_edges=70).collect()}
    assert full == hybrid
    assert len(full) == 180 and len(set(full.values())) == 60


def test_star_contraction_empty_and_selfloops(spark):
    from ru_cdc_spark.operators.dedup import star_contraction_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert star_contraction_components(empty).count() == 0
    only_loops = spark.createDataFrame([(5, 5), (6, 6)], ["src", "dst"])
    assert star_contraction_components(only_loops).count() == 0


def test_components_preserve_nonlong_vertex_types(spark):
    """The driver union-find finish must keep the distributed path's
    type contract: string and int vertex ids come back with the same
    schema from both paths (round-6 ADVICE: the hybrid hardcoded
    'doc_id long, component long')."""
    from ru_cdc_spark.operators.dedup import star_contraction_components

    pairs = [("d", "b"), ("b", "a"), ("x", "y"), ("q", "q2")]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    for fn in (connected_components, star_contraction_components):
        hybrid = fn(edges)
        dist = fn(edges, driver_finish_edges=0)
        assert hybrid.schema == dist.schema, fn.__name__
        h = {r["doc_id"]: r["component"] for r in hybrid.collect()}
        d = {r["doc_id"]: r["component"] for r in dist.collect()}
        assert h == d == {"a": "a", "b": "a", "d": "a",
                          "x": "x", "y": "x", "q": "q", "q2": "q"}

    iedges = spark.createDataFrame([(1, 2), (3, 4)], "src int, dst int")
    for fn in (connected_components, star_contraction_components):
        assert fn(iedges).schema == fn(iedges, driver_finish_edges=0).schema
