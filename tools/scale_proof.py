"""Measured sf0.1 -> sf1 scaling of the most expensive headline queries
(round-7 verdict item #2): run each query once warmed at both scale
factors and print wall-time ratios. A 10x data step should cost <=~10x
on a fixed-size machine; anything clearly superlinear (> ~12x) names a
plan to fix or a ceiling to document in SCALE.md.

Usage: python tools/scale_proof.py [sf1_dir]
(generate sf1 first: python tools/gen_sf1.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402

QUERIES = [
    "acid_merge_snapshot",
    "text_duplicate_span_strip",
    "ann_pq_rerank",
    "corpus_dedup_retain",
    "dedup_clusters_star",
    "cdc_merge_snapshot",
    # round-9 additions (round-8 verdict item #4): the r8 curation
    # flagships scale with the documents table
    "corpus_pack_windows",
    "corpus_decontaminate",
    # round-10 additions (round-9 verdict item #6): the r9 flagships
    "corpus_mix_domains",
    "corpus_length_buckets",
    "events_pattern_match",
    "ann_batch_queries",
    # round-10 flagships, scale-proven the round they shipped:
    # (multimodal_audio_spectral is sf-invariant by design — a fixed
    # 240-clip sample — so it has no 10x leg)
    "zorder_layout_stats",
    "zorder_scan_fraction",
    "dpp_pruned_fact_join",
    "text_lang_id_confusion",
    # round-13 flagships, scale-proven the round they shipped:
    # SCD2 batch (one LEAD-window shuffle), SCD2 streaming (state =
    # one long per live key; fixed 3-batch machinery dilutes the
    # ratio — the data-path cost is the state-store + edge join), and
    # the seeded shuffle-shard layout (hash exchange + in-partition
    # sort, no global sort)
    "cdc_scd2_history",
    "cdc_scd2_stream",
    "corpus_shuffle_shards",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf1 = args[0] if args else "/tmp/sfdata/sf1"
    only = next((a.split("=", 1)[1].split(",") for a in sys.argv
                 if a.startswith("--only=")), None)
    if only:
        unknown = [n for n in only if n not in QUERIES]
        if unknown:
            raise SystemExit(f"ERROR: not in QUERIES: {unknown}")
    queries = [n for n in QUERIES if only is None or n in only]
    sf01 = "/root/testdata/sf0.1"
    spark = get_spark("scale-proof")
    from ru_cdc_spark.operators.rankops import release_rank_caches

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup
    force(REGISTRY["cdc_envelope"].fn(spark, sf01))

    out = {}
    for name in queries:
        times = {}
        for label, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                force(REGISTRY[name].fn(spark, sf_dir))
                best = min(best, time.time() - t0)
                release_rank_caches()
                spark.catalog.clearCache()
            times[label] = round(best, 2)
        ratio = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        out[name] = {**times, "ratio": ratio}
        print(f"{name}: sf0.1={times['sf0.1']}s sf1={times['sf1']}s "
              f"ratio={ratio}x", flush=True)
    print(json.dumps(out))


def throughput(sf1_dir: str) -> None:
    """Round-8 verdict item #4: the streaming/throughput bench legs at
    1x vs 10x fixture sizes (one-off — the frozen bench sizes stay
    untouched). The metric is rows/s DEGRADATION: a leg whose rows/s
    drops >30% at 10x has a super-linear bottleneck to name."""
    import bench

    spark = get_spark("scale-proof")
    out = {}

    def leg(name, fn, one, ten):
        r = {}
        for label, kwargs, rows_hint in (("1x", one, None),
                                         ("10x", ten, None)):
            # throughput legs return (sec, rows) or (sec, rows, jobs)
            sec, rows = fn(spark, **kwargs)[:2]
            r[label] = {"sec": round(sec, 2), "rows": rows,
                        "rows_per_sec": round(rows / sec, 1)}
        r["rows_per_sec_ratio"] = round(
            r["10x"]["rows_per_sec"] / r["1x"]["rows_per_sec"], 2)
        out[name] = r
        print(f"{name}: 1x={r['1x']['rows_per_sec']/1000:.1f}k rows/s "
              f"10x={r['10x']['rows_per_sec']/1000:.1f}k rows/s "
              f"ratio={r['rows_per_sec_ratio']}x", flush=True)

    leg("txn_assembly", bench.bench_txn_assembly,
        dict(n_txns=80_000, n_segments=500),
        dict(n_txns=800_000, n_segments=5_000))
    leg("socket_ingest", bench.bench_socket_ingest,
        dict(n_rows=100_000, n_slices=16),
        dict(n_rows=1_000_000, n_slices=16))
    leg("bootstrap_snapshot", bench.bench_bootstrap_snapshot,
        dict(n_rows=50_000, chunk=2_000),
        dict(n_rows=500_000, chunk=2_000))
    leg("cdc_stream_pipeline", bench.bench_stream_pipeline,
        dict(sf_dir="/root/testdata/sf0.1"), dict(sf_dir=sf1_dir))
    print(json.dumps(out))


def sparse_merge() -> None:
    """Round-8 verdict item #4 (fixture-driven leg): the MINIMAL-image
    sparse merge (operators/merge.py merge_sparse_changes) at 1x vs 10x
    its fixture size. The plan is one PK hash shuffle with map-side
    partials; the bar is wall-time ratio <= ~12x at 10x rows."""
    from ru_cdc_spark.operators.merge import merge_sparse_changes
    from ru_cdc_spark.sources.binlog_frames import (
        SPARSE_CDC_N_ROWS,
        SPARSE_EMIT_COLS,
        decode_sparse_cdc_frames,
        generate_sparse_cdc_frames,
    )

    spark = get_spark("scale-proof")

    def run(n_rows: int) -> float:
        changes = decode_sparse_cdc_frames(
            generate_sparse_cdc_frames(spark, n_rows, mode="MINIMAL")
            .select("frame"))
        merged = merge_sparse_changes(
            changes, ["i"], [n for n, _ in SPARSE_EMIT_COLS],
            seq_col="seq", type_col="type")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            merged.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    run(SPARSE_CDC_N_ROWS)  # warmup
    one = run(SPARSE_CDC_N_ROWS)
    ten = run(SPARSE_CDC_N_ROWS * 10)
    hundred = run(SPARSE_CDC_N_ROWS * 100)
    out = {"1x": one, "10x": ten, "100x": hundred,
           "ratio_10x": round(ten / max(one, 1e-9), 2),
           "ratio_100x": round(hundred / max(one, 1e-9), 2)}
    print(json.dumps({"merge_sparse_changes": out}))


def recall(sf1_dir: str) -> None:
    """ANN recall@3 at sf1 (hash-noise-decorrelated 10x embeddings) for
    IVF-kmeans, PQ-rerank, and the canonical L-tables LSH (round 9:
    replaces the retired ann_multiprobe pedagogical baseline) — each
    must hold within 0.05 of its sf0.1 gate."""
    spark = get_spark("scale-proof")
    out = {}
    for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                             ("sf1", sf1_dir)):
        exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
        truth = {(r.q_vec, r.neighbor) for r in exact.collect()
                 if r.rank <= 3}
        for name in ("ann_ivf_kmeans", "ann_pq_rerank",
                     "ann_lsh_tables", "ann_batch_queries"):
            approx = REGISTRY[name].fn(spark, sf_dir)
            got = {(r.q_vec, r.neighbor) for r in approx.collect()}
            rec = round(len(truth & got) / max(len(truth), 1), 3)
            out.setdefault(name, {})[sf_label] = rec
            print(f"{name} recall@3 {sf_label}: {rec}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--throughput" in sys.argv:
        throughput(sys.argv[-1] if not sys.argv[-1].startswith("--")
                   else "/tmp/sfdata/sf1")
    elif "--recall" in sys.argv:
        recall(sys.argv[-1] if not sys.argv[-1].startswith("--")
               else "/tmp/sfdata/sf1")
    elif "--sparse-merge" in sys.argv:
        sparse_merge()
    else:
        main()
