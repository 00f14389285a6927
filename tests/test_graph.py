"""PageRank (operators/graph.py): power-iteration equivalence against a
dense NumPy reference, mass conservation, and graph-shape sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ru_cdc_spark.operators import graph as g
from ru_cdc_spark.sources.readers import load_table


def _numpy_pagerank(edges, alpha=0.85, n_iter=10):
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    M = np.zeros((n, n))
    for s, d, w in edges:
        M[idx[d], idx[s]] += w
    outw = M.sum(axis=0)
    M = M / outw  # column-stochastic (no dangling nodes by construction)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - alpha) / n + alpha * (M @ r)
    return dict(zip(verts, r))


def test_pagerank_matches_dense_power_iteration(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    edges_df = g.copurchase_edges(li)
    edges = [(r["src"], r["dst"], r["w"]) for r in edges_df.collect()]
    want = _numpy_pagerank(edges)
    got = {r["v"]: r["r"] for r in g.pagerank(edges_df).collect()}
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in got)
    assert worst < 1e-9, worst


def test_pagerank_conserves_mass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ranks = g.pagerank(g.copurchase_edges(li))
    total = ranks.agg(F.sum("r")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9  # symmetric graph: no dangling leak


def test_copurchase_edges_symmetric_no_self_loops(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    e = g.copurchase_edges(li).cache()
    assert e.where(F.col("src") == F.col("dst")).count() == 0
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                   "w")
    assert e.exceptAll(rev).count() == 0  # edge set closed under reversal


def test_part_pagerank_topk_shape(spark, sf_dir):
    top = g.part_pagerank(spark, sf_dir, k=10).collect()
    assert len(top) == 10
    ranks = [r["rank"] for r in top]
    assert ranks == sorted(ranks, reverse=True)


def test_triangle_census_on_known_graphs(spark, tmp_path):
    """K4 basket -> 4 triangles / 12 wedges; a disjoint 2-part basket adds
    one edge and no triangles."""
    from ru_cdc_spark.operators.graph import copurchase_triangles

    rows = [(1, p, 1) for p in (10, 20, 30, 40)] + [(2, 50, 1), (2, 60, 1)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int") \
        .write.mode("overwrite") \
        .parquet(str(tmp_path / "lineitem.parquet"))
    out = copurchase_triangles(spark, str(tmp_path)).collect()[0]
    assert out["n_vertices"] == 6
    assert out["n_edges"] == 7          # C(4,2) + 1
    assert out["n_wedges"] == 12        # K4 only: 4 vertices of degree 3
    assert out["n_triangles"] == 4      # the 4 faces of K4


def test_kcore_fixpoint_and_maximality(spark):
    """3-core semantics on a known graph: K4 plus a pendant path. The
    core must be exactly K4 (fixpoint: every member keeps >= 3 neighbors
    inside; maximality: every peeled vertex has < 3 core neighbors)."""
    from ru_cdc_spark.operators.graph import kcore

    und_pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
                 (4, 5), (5, 6)]                                  # pendant
    edges = spark.createDataFrame(
        und_pairs + [(b, a) for a, b in und_pairs], "src long, dst long")
    core = {r["v"]: r["core_deg"] for r in kcore(edges, 3).collect()}
    assert set(core) == {1, 2, 3, 4}
    assert all(d >= 3 for d in core.values())


def test_kcore_on_copurchase_graph(spark, sf_dir):
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.graph import copurchase_edges, kcore
    from ru_cdc_spark.sources.readers import load_table

    und = copurchase_edges(load_table(spark, sf_dir, "lineitem")) \
        .select("src", "dst")
    core = kcore(und, 3).localCheckpoint()
    assert core.where(F.col("core_deg") < 3).count() == 0
    # maximality: no peeled vertex has >= 3 neighbors inside the core
    members = core.select("v")
    outside = (und.join(members.withColumnRenamed("v", "src"), "src",
                        "anti")
               .join(members.withColumnRenamed("v", "dst"), "dst", "semi")
               .groupBy("src").agg(F.count("*").alias("into_core")))
    assert outside.where(F.col("into_core") >= 3).count() == 0
