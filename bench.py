"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Execution is forced through the ``noop`` datasource writer so every plan
runs end-to-end (no count()-only shortcuts where Catalyst could prune the
expensive projections) without materializing results on the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_envelope",
    "cdc_merge_snapshot",
    "cdc_route",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "top_orders_per_customer",
    "events_hourly_rollup",
    "events_sessionize",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "knn_brute_force",
    "text_stats",
    "doc_fingerprint",
    "multimodal_meta",
    "mysql_type_semantics",
    # the LLM-pipeline heavyweights (round-2 verdict: track the operators
    # that dominate a real corpus pipeline, not just TPC-H shapes)
    "dedup_clusters_star",
    "text_bm25_search",
    "ann_pq_rerank",
    "corpus_dedup_retain",
    "multimodal_png_decode",
    "multimodal_image_decode",
    "multimodal_media_decode",
    "mysql_socket_cdc_snapshot",
    "mysql_socket_txn_changes",
    "mysql_socket_tls_snapshot",
    "acid_merge_snapshot",
    # round-5 additions: compressed transactions (file + live socket),
    # partial JSON updates, trained BPE counting, span stripping
    "binlog_txn_compressed",
    "mysql_socket_txn_compressed",
    "binlog_partial_json_update",
    "text_bpe_token_counts",
    "text_duplicate_span_strip",
    # round-8 additions: MINIMAL-row-image merge, catalog-free
    # fused socket decode (the r07..r06 comparison set is the 35
    # entries above — compare per-query, not totals, across rounds)
    "binlog_minimal_image_merge",
    "mysql_socket_metadata_snapshot",
    # round-9 additions: canonical L-tables LSH index + one-scan batch
    # serving + WKB geometry decode (the r08..r07 comparison set is
    # the 37 entries above). cdc_kafka_group_rebalance is deliberately
    # NOT a bench leg: its injected member death waits out a session
    # timeout by design — a fault-injection correctness query, like
    # cdc_kafka_broker_failover before it.
    "ann_lsh_tables",
    "ann_batch_queries",
    "mysql_geometry_decode",
    # round-10 additions — the r09..r08 comparison set is the 39
    # HEADLINE entries above (40 timed legs counting the
    # cdc_stream_pipeline leg main() appends): Z-order layout stats
    # (pure-JVM integer plan) and per-clip FFT audio analysis (Arrow
    # batch pipeline)
    "zorder_layout_stats",
    "multimodal_audio_spectral",
    # round-11 additions — the r10..r09 comparison set is the 41
    # entries above: the persisted-index lifecycle
    # (build/append/compact/serve) and BM25+vector RRF hybrid
    # retrieval. ann_lsh_stream_ingest is NOT a leg: its micro-batch
    # trigger machinery measures Structured Streaming overhead, not
    # operator throughput (same policy as the fault-injection queries).
    "ann_lsh_incremental",
    "hybrid_rrf_search",
    # round-12 addition — the r11..r10 comparison set is the 43 entries
    # above: persisted-band-index dedup admission (build + manifest-
    # pinned semi-join on the shared PostingsStore).
    # dedup_stream_admission is NOT a leg for the same reason as
    # ann_lsh_stream_ingest: its 3-trigger micro-batch machinery
    # measures Structured Streaming overhead, not operator throughput.
    "dedup_index_admission",
]


# ---------------------------------------------------------------------------
# FROZEN throughput-fixture sizes (round 6 values, pinned permanently):
# resizing these breaks round-over-round comparability of the rows/s
# figures — r06 cleared its bars partly via a resize, so from r07 on the
# sizes are constants and the JSON reports both the sizes and the
# measured per-job floor, making every number reproducible and
# floor-adjustable. Do NOT change without renaming the metric.
# ---------------------------------------------------------------------------
TXN_BENCH_TXNS = 80_000          # ~200k row images
TXN_BENCH_SEGMENTS = 500
SOCKET_BENCH_ROWS = 100_000
SOCKET_BENCH_SLICES = 16


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_in_job_group(spark, fn):
    """Run ``fn()`` under a unique job group and return
    ``(result, n_jobs)`` where ``n_jobs`` is the number of Spark jobs the
    call launched (StatusTracker, public API). The per-job scheduling
    floor hits EVERY job a leg runs, so floor adjustment must scale by
    the leg's job count — subtracting one floor per leg (rounds 6-9)
    under-corrected multi-job legs whenever the sandbox floor shifted
    (r9: socket_ingest read 3.7x slower floor-adjusted while the idle
    truth was ~1.2x)."""
    import uuid

    sc = spark.sparkContext
    group = f"bench_{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, "bench job-count probe")
    try:
        out = fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def bench_stream_pipeline(spark, sf_dir: str
                          ) -> tuple[float, int, float, bool]:
    """End-to-end streaming CDC throughput (the reference's headline
    metric shape): Canal payloads through readStream -> two-phase parse ->
    route -> parquet sink with checkpointing, availableNow. Returns
    (elapsed_sec, rows, addbatch_sec, addbatch_is_wall_fallback).

    ``addbatch_sec`` is the batch's ``durationMs.addBatch`` from the
    query progress — the DATA-PATH time (decode + route + sink write)
    with the fixed streaming machinery (query startup, offset/commit WAL
    fsyncs, planning ~0.4-0.5s) excluded.  The r12 standalone triage
    showed the wall-based figure is ~40% fixed machinery at the frozen
    210k-row fixture, so wall rows/s tracks sandbox fs/scheduling
    latency, not pipeline throughput: r10->r12 wall drifted 0.92->1.19s
    idle while addBatch held ~0.7s (~290k rows/s).  Wall stays the
    historical headline; addBatch is the contention-robust comparator."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ru_cdc_spark.config import InstanceConfig, PipelineConfig
    from ru_cdc_spark.operators.envelope import build_envelope, envelope_to_json
    from ru_cdc_spark.sources.cdc_fixture import (
        ORDERS_DATABASE,
        ORDERS_MYSQL_TYPES,
        ORDERS_PK,
        ORDERS_TABLE,
        derive_order_changes,
    )
    from ru_cdc_spark.streaming.pipeline import CdcPipeline

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        env = build_envelope(
            derive_order_changes(spark, sf_dir),
            ORDERS_DATABASE, ORDERS_TABLE, ORDERS_PK, ORDERS_MYSQL_TYPES,
            processing_ts=F.lit(0))
        payloads = envelope_to_json(env).select("payload")
        src = f"{work}/src"
        # one file per core: file-source parallelism == source partition
        # count (a Kafka topic would be partitioned the same way)
        n_parts = spark.sparkContext.defaultParallelism
        payloads.repartition(n_parts).write.mode("overwrite").text(src)
        n_rows = spark.read.text(src).count()

        cfg = PipelineConfig(
            source_path=src, checkpoint_dir=f"{work}/ck",
            max_events_per_trigger=10_000_000,  # single availableNow batch
            instances=[InstanceConfig(mq="m", schemas="test*", tables="*",
                                      topic="bench_topic")],
        )
        pipe = CdcPipeline(spark, cfg)
        t0 = time.time()
        q = pipe.start_to_parquet(f"{work}/out", f"{work}/ck")
        q.awaitTermination(600)
        elapsed = time.time() - t0
        progress = q.recentProgress
        # sum across data-carrying batches: max_events_per_trigger pins
        # this to ONE batch today, but a config change or a trailing
        # empty progress entry must not divide the full row count by a
        # single batch's (possibly near-zero) addBatch time. And
        # recentProgress is a RING BUFFER (default 100 entries): if the
        # earliest retained batchId isn't 0, batches were evicted and
        # the sum would undercount — fall back to wall time rather than
        # report an inflated throughput.
        # durationMs.addBatch can be absent on a progress entry (e.g. a
        # no-data planning tick) — .get + filter, never a KeyError that
        # aborts the whole bench (r12 advice)
        batch_secs = [
            ab / 1000.0 for ab in
            (p.get("durationMs", {}).get("addBatch")
             for p in progress if p.get("numInputRows", 0) > 0)
            if ab is not None]
        evicted = bool(progress) and progress[0]["batchId"] != 0
        fallback = not batch_secs or evicted
        # when falling back, report WALL under the addbatch return and
        # FLAG it — the payload's fallback bit keeps the machinery-
        # inclusive figure from silently impersonating the data-path one
        addbatch_sec = elapsed if fallback else sum(batch_secs)
        return elapsed, n_rows, addbatch_sec, fallback
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_txn_assembly(spark, n_txns: int = TXN_BENCH_TXNS,
                       n_segments: int = TXN_BENCH_SEGMENTS
                       ) -> tuple[float, int]:
    """Transactional binlog assembly throughput: 80k transactions
    (~200k row images) of real wire bytes decoded + grouped into atomic
    commit sets. Segment generation is checkpointed first so the timing
    covers the assembly operator itself.

    Sized so decode work dominates the measurement: at the old 20k-txn
    size the whole job finished in ~0.45s, of which ~0.35s was the
    local-mode per-job floor (a no-op mapInPandas stage costs that much
    here) — the number tracked Spark job-launch overhead, not assembly.
    At 200k rows the compute:floor ratio makes this a steady-state
    throughput figure. Min of 3 timed runs (was 2 through r07; fixture
    sizes untouched so comparability holds — like the socket/stream
    legs, min over more trials only removes noise-driven LOW readings
    on this shared sandbox), generation outside the clock, shared
    across runs."""
    from ru_cdc_spark.sources.binlog_txn import (
        assemble_transactions,
        generate_txn_segments,
    )

    n_parts = spark.sparkContext.defaultParallelism
    segs = generate_txn_segments(spark, n_txns, n_segments,
                                 n_partitions=n_parts).localCheckpoint()
    best = float("inf")
    n, best_jobs = 0, 1
    for _ in range(3):
        t0 = time.time()
        (n, jobs) = run_in_job_group(
            spark, lambda: assemble_transactions(segs).count())
        sec = time.time() - t0
        if sec < best:
            best, best_jobs = sec, jobs
    segs.unpersist()
    return best, n, best_jobs


def bench_socket_ingest(spark, n_rows: int = SOCKET_BENCH_ROWS,
                        n_slices: int = SOCKET_BENCH_SLICES
                        ) -> tuple[float, int, int, int, float]:
    """Socket ingest throughput: a 100k-row virtual binlog served over
    real TCP, dumped by 16 task-local connections, byte-decoded, and
    counted — the reference's wire-to-rows path end to end (round 8:
    the fused reader decodes inside the dump task, so frame bytes never
    cross the JVM; same work, one Python crossing instead of three).
    Server build happens before the clock; the timing covers connect +
    dump + frame reassembly + byte decode. Sized (like the txn-assembly bench) so
    compute dominates the local-mode per-job floor and the number is a
    steady-state throughput figure."""
    from ru_cdc_spark.sources.mysql_fixture_server import (
        MySQLFixtureServer,
        VirtualBinlog,
    )
    from ru_cdc_spark.sources.mysql_socket_source import socket_cdc_changes

    srv = MySQLFixtureServer(
        binlog=VirtualBinlog.from_cdc_fixture(n_rows)).start()
    try:
        # warm the sha2 fast-auth cache + server RSA key before the
        # clock: steady-state ingest re-uses authenticated sessions
        # (the reference holds its connection open); a cold cache would
        # bill one-time full-auth RSA setup to the throughput number
        from ru_cdc_spark.sources.mysql_client import MySQLConnection

        MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                srv.password).close()
        # min of 3 (was 2 through r06; fixture sizes untouched so
        # comparability holds — min over more trials only removes
        # noise-driven LOW readings on this shared sandbox): run 2+
        # also exercises the steady-state layout cache (append-only
        # file, unchanged end_pos -> no driver re-listing)
        best = float("inf")
        n, best_jobs = 0, 1
        for _ in range(3):
            t0 = time.time()
            (n, jobs) = run_in_job_group(
                spark,
                lambda: socket_cdc_changes(spark, "127.0.0.1", srv.port,
                                           srv.user, srv.password,
                                           n_slices=n_slices).count())
            sec = time.time() - t0
            if sec < best:
                best, best_jobs = sec, jobs
        dp_rows, dp_sec = _socket_datapath(spark, srv.port, srv.user,
                                           srv.password, n_slices)
        return best, n, best_jobs, dp_rows, dp_sec
    finally:
        srv.stop()


def _socket_datapath(spark, port: int, user: str, password: str,
                     n_slices: int) -> tuple[int, float]:
    """IN-PIPELINE timer for the socket leg (the addBatch treatment the
    cdc_stream leg got in r12): each executor task times its OWN
    connect + dump + frame-reassembly + byte-decode window — the exact
    per-slice data path socket_cdc_changes runs (same fetch_binlog_
    layout / slice_at_table_maps / _dump_frames / decode_cdc_blobs
    chain) — and emits (rows, sec). Throughput = rows / max(task sec),
    the parallel critical path: Spark job launch, task scheduling, and
    result collection (the components driver-run contention inflates;
    r12 driver read 41.7k wall rows/s vs 124.6k standalone-idle) are
    excluded by construction. Arrow result shipping is also outside the
    window — it belongs to whichever sink consumes the stream. Wall
    keys are untouched; this is the contention-robust comparator."""
    from ru_cdc_spark.sources.mysql_socket_source import (
        _dump_frames,
        _slice_ranges_df,
        fetch_binlog_layout,
        slice_at_table_maps,
    )

    fname, _end, events = fetch_binlog_layout("127.0.0.1", port, user,
                                              password)
    ranges = _slice_ranges_df(spark, slice_at_table_maps(events,
                                                         n_slices))

    def timed(batches):
        import time as _t

        import pandas as _pd

        from ru_cdc_spark.sources.binlog_frames import decode_cdc_blobs

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                t0 = _t.time()
                frames = _dump_frames("127.0.0.1", port, user, password,
                                      fname, int(lo), int(hi))
                n = len(decode_cdc_blobs((f for _pos, f in frames)))
                yield _pd.DataFrame({"rows": [n],
                                     "sec": [_t.time() - t0]})

    dp_rows, dp_sec = 0, float("inf")
    for _ in range(2):  # min of 2: drop a cold-path high reading
        stats = ranges.mapInPandas(timed, "rows long, sec double") \
            .collect()
        dp_rows = sum(r.rows for r in stats)
        dp_sec = min(dp_sec, max(r.sec for r in stats))
    return dp_rows, dp_sec


BOOTSTRAP_BENCH_ROWS = 50_000
BOOTSTRAP_BENCH_CHUNK = 2_000


def bench_bootstrap_snapshot(spark, n_rows: int = BOOTSTRAP_BENCH_ROWS,
                             chunk: int = BOOTSTRAP_BENCH_CHUNK
                             ) -> tuple[float, int, int, int, float]:
    """DBLog incremental-snapshot throughput: a 50k-row live table
    chunk-read over real TCP (25 chunks of 2k, one watermark pair +
    window dump each, parallel executor tasks), counted. Server and
    table build happen before the clock; min of 2 like the other
    wire benches."""
    import time as _time

    from ru_cdc_spark.sources.binlog_wire import (
        CHECKSUM_NONE,
        ColSpec,
        T_LONG,
        T_LONGLONG,
        T_NEWDECIMAL,
        T_VARCHAR,
        encode_format_description,
    )
    from ru_cdc_spark.sources.incremental_snapshot import (
        plan_snapshot,
        snapshot_chunks,
    )
    from ru_cdc_spark.sources.mysql_client import MySQLConnection
    from ru_cdc_spark.sources.mysql_fixture_server import (
        MySQLFixtureServer,
        VirtualBinlog,
    )

    vb = VirtualBinlog()
    vb.append(encode_format_description(CHECKSUM_NONE))
    srv = MySQLFixtureServer(binlog=vb).start()
    try:
        from decimal import Decimal

        t = srv.add_live_table("snaptab", [
            ("id", ColSpec(T_LONGLONG)),
            ("val", ColSpec(T_LONG)),
            ("name", ColSpec(T_VARCHAR, (300,))),
            ("amount", ColSpec(T_NEWDECIMAL, (12, 4))),
        ])
        for base in range(0, n_rows, 1000):
            t.insert(*[(i, (i * 17) % 10000, f"n_{i % 97}",
                        Decimal((i * 31) % 10**8).scaleb(-4))
                       for i in range(base, base + 1000)])
        MySQLConnection.connect("127.0.0.1", srv.port, srv.user,
                                srv.password).close()
        best = float("inf")
        n, best_jobs = 0, 1

        def one_run():
            plan = plan_snapshot("127.0.0.1", srv.port, srv.user,
                                 srv.password, "snaptab",
                                 chunk_size=chunk)
            return snapshot_chunks(spark, "127.0.0.1", srv.port,
                                   srv.user, srv.password, plan).count()

        for _ in range(2):
            t0 = _time.time()
            (n, jobs) = run_in_job_group(spark, one_run)
            sec = _time.time() - t0
            if sec < best:
                best, best_jobs = sec, jobs
        dp_rows, dp_sec = _bootstrap_datapath(
            spark, srv.port, srv.user, srv.password, chunk)
        return best, n, best_jobs, dp_rows, dp_sec
    finally:
        srv.stop()


def _bootstrap_datapath(spark, port: int, user: str, password: str,
                        chunk: int) -> tuple[int, float]:
    """In-pipeline timer for the DBLog snapshot leg (see
    :func:`_socket_datapath`): each chunk task times its own watermark
    + windowed chunk read (the exact read_chunk call snapshot_chunks
    makes) and emits (rows, sec); throughput = rows / max(task sec) —
    the machinery-free counter driver-run contention can't halve."""
    from ru_cdc_spark.sources.incremental_snapshot import plan_snapshot
    from ru_cdc_spark.sources.mysql_socket_source import _slice_ranges_df

    plan = plan_snapshot("127.0.0.1", port, user, password, "snaptab",
                         chunk_size=chunk)
    # EXACTLY one chunk per partition, no exchange (a round-robin
    # repartition can land 2 chunks on one task and 0 on another,
    # serializing work the max-task-sec critical path assumes parallel)
    ranges = _slice_ranges_df(spark, [(int(lo), int(hi))
                                      for lo, hi in plan.ranges])

    def timed(batches):
        import time as _t

        import pandas as _pd

        from ru_cdc_spark.sources.incremental_snapshot import read_chunk

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                t0 = _t.time()
                rows, _pos = read_chunk("127.0.0.1", port, user,
                                        password, plan, int(lo),
                                        int(hi))
                yield _pd.DataFrame({"rows": [len(rows)],
                                     "sec": [_t.time() - t0]})

    dp_rows, dp_sec = 0, float("inf")
    for _ in range(2):
        stats = ranges.mapInPandas(timed, "rows long, sec double") \
            .collect()
        dp_rows = sum(r.rows for r in stats)
        dp_sec = min(dp_sec, max(r.sec for r in stats))
    return dp_rows, dp_sec


def calibration_probe(spark) -> float:
    """Fixed tiny query (1-row scan + agg) whose wall time depends only
    on scheduler/JVM responsiveness, never on this repo's code: a
    contended machine inflates it the same way it inflates every real
    query, so a slow round self-identifies in the JSON instead of
    reading as a code regression (round-4 driver bench was uniformly
    ~1.5-2x on unchanged queries; this sentinel disambiguates)."""
    t0 = time.time()
    spark.range(1000).selectExpr("sum(id)").collect()
    return round(time.time() - t0, 4)




def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # a misspelled leg name must fail loudly, not skip silently
    unknown = [n for n in HEADLINE if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"ERROR: unknown HEADLINE leg(s): {unknown}")

    spark = get_spark("bench")

    # warm the JVM: a trivial scan for parquet footers, then one untimed
    # full-pipeline run — the first query executed in a fresh JVM pays
    # 3-4s of whole-stage-codegen JIT that no steady-state number includes
    # (measured: cdc_envelope run0 4.8s, run1 1.8s, run2+ 1.3s)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    force(REGISTRY["cdc_envelope"].fn(spark, sf_dir))

    load_start = os.getloadavg()
    calib_start = min(calibration_probe(spark) for _ in range(3))
    # the calibration no-op doubles as the per-job scheduling floor:
    # measured UP FRONT on the warmed, idle JVM (at the end of the run
    # the machine is still draining executor threads and the probe
    # would read contention, not the floor)
    job_floor = calib_start

    from ru_cdc_spark.operators.rankops import release_rank_caches

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):  # min of 2 damps machine noise + JIT warmup
            t0 = time.time()
            force(REGISTRY[name].fn(spark, sf_dir))
            best = min(best, time.time() - t0)
            # rank/running-sum intermediates are persisted for plan
            # consistency; the noop write has materialized them, so
            # release eagerly — leaked MEMORY_AND_DISK blocks otherwise
            # squeeze every later query's executor cache
            release_rank_caches()
        timings[name] = round(best, 3)

    # section boundary: the stream benchmark is the engine's headline
    # throughput metric — run it against a CLEAN cache so 27 queries'
    # worth of leftover blocks/broadcasts can't tax it (round-3 bench
    # measured a 2x regression from exactly this accumulation)
    release_rank_caches()
    spark.catalog.clearCache()

    # min of 3 for the streaming run (was 2 through r06): query
    # startup + sink commit overhead are the noisiest components of
    # the whole suite — idle-machine spreads of 2x were observed on
    # this leg alone; the extra trial costs ~1.5s and only removes
    # noise-driven low readings
    (stream_sec, stream_rows, stream_addbatch,
     stream_ab_fallback) = bench_stream_pipeline(spark, sf_dir)
    for _ in range(2):
        s2, _, ab2, fb2 = bench_stream_pipeline(spark, sf_dir)
        stream_sec = min(stream_sec, s2)
        # the fallback flag must describe the trial that SUPPLIED the
        # min — OR-ing across trials would label a genuine addBatch
        # reading as wall whenever any other trial fell back
        if ab2 < stream_addbatch:
            stream_addbatch, stream_ab_fallback = ab2, fb2
    timings["cdc_stream_pipeline"] = round(stream_sec, 3)

    txn_sec, txn_rows, txn_jobs = bench_txn_assembly(spark)

    (sock_sec, sock_rows, sock_jobs,
     sock_dp_rows, sock_dp_sec) = bench_socket_ingest(spark)

    (boot_sec, boot_rows, boot_jobs,
     boot_dp_rows, boot_dp_sec) = bench_bootstrap_snapshot(spark)

    load_end = os.getloadavg()
    calib_end = min(calibration_probe(spark) for _ in range(3))

    def floor_adj(rows: int, sec: float, n_jobs: int):
        # throughput with the fixed per-job launch cost removed — the
        # figure that is comparable across fixture sizes and machines.
        # The floor hits EVERY job a leg runs (counted via job groups,
        # reported under throughput_leg_jobs), so the subtraction is
        # floor x jobs — one-floor-per-leg (r6-r9) under-corrected
        # multi-job legs across sandbox floor shifts. Meaningful only
        # when the measurement clearly dominates the floor; otherwise
        # null rather than a fabricated number.
        floor_total = job_floor * max(n_jobs, 1)
        if sec <= 2 * floor_total:
            return None
        return round(rows / (sec - floor_total), 1)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cdc_stream_rows": stream_rows,
        "cdc_stream_rows_per_sec": round(stream_rows / stream_sec, 1),
        # r12: data-path throughput (addBatch only) — the wall figure is
        # ~40% fixed streaming machinery at this fixture size, so it
        # tracks sandbox latency; this one tracks the pipeline
        "cdc_stream_addbatch_sec": round(stream_addbatch, 3),
        "cdc_stream_addbatch_rows_per_sec": round(
            stream_rows / stream_addbatch, 1),
        # true when the addbatch figure above is actually WALL time
        # (no usable durationMs.addBatch, or the progress ring buffer
        # evicted batches) — never let the machinery-inclusive number
        # silently impersonate the data-path one (r12 advice)
        "cdc_stream_addbatch_fallback_wall": stream_ab_fallback,
        "txn_assembly_rows": txn_rows,
        "txn_assembly_rows_per_sec": round(txn_rows / txn_sec, 1),
        "txn_assembly_rows_per_sec_floor_adj": floor_adj(txn_rows,
                                                         txn_sec,
                                                         txn_jobs),
        "socket_ingest_rows": sock_rows,
        "socket_ingest_rows_per_sec": round(sock_rows / sock_sec, 1),
        "socket_ingest_rows_per_sec_floor_adj": floor_adj(sock_rows,
                                                          sock_sec,
                                                          sock_jobs),
        # r13: in-pipeline data-path counter (the addBatch treatment,
        # r12 verdict #3) — per-task connect+dump+decode window, job
        # machinery excluded; wall keys above unchanged
        "socket_ingest_datapath_sec": round(sock_dp_sec, 3),
        "socket_ingest_datapath_rows_per_sec": round(
            sock_dp_rows / sock_dp_sec, 1),
        # round 7 addition (new key, never re-sized): DBLog chunked
        # snapshot throughput — watermarked SELECT chunks + window
        # dumps, parallel chunk tasks, end-to-end to counted rows
        "bootstrap_snapshot_rows": boot_rows,
        "bootstrap_snapshot_rows_per_sec": round(boot_rows / boot_sec,
                                                 1),
        "bootstrap_snapshot_rows_per_sec_floor_adj": floor_adj(
            boot_rows, boot_sec, boot_jobs),
        "bootstrap_datapath_sec": round(boot_dp_sec, 3),
        "bootstrap_datapath_rows_per_sec": round(
            boot_dp_rows / boot_dp_sec, 1),
        # r10: Spark-job count of each throughput leg's best trial
        # (job-group StatusTracker count) — the floor adjustment above
        # subtracts job_floor_sec x this, so the adjusted rows/s stays
        # comparable across sandbox per-job floor shifts
        "throughput_leg_jobs": {
            "txn_assembly": txn_jobs,
            "socket_ingest": sock_jobs,
            "bootstrap_snapshot": boot_jobs,
        },
        # the local-mode per-job scheduling floor (the calibration
        # no-op, measured up front) and the PINNED fixture sizes —
        # frozen at the r06 values so rows/s is round-over-round
        # comparable from r07 on
        "job_floor_sec": job_floor,
        "fixture_sizes": {
            "txn_assembly_txns": TXN_BENCH_TXNS,
            "txn_assembly_segments": TXN_BENCH_SEGMENTS,
            "socket_ingest_rows": SOCKET_BENCH_ROWS,
            "socket_ingest_slices": SOCKET_BENCH_SLICES,
            "bootstrap_snapshot_rows": BOOTSTRAP_BENCH_ROWS,
            "bootstrap_snapshot_chunk": BOOTSTRAP_BENCH_CHUNK,
        },
        # contention sentinel: external load + a fixed calibration query
        # (code-independent). calibration >> ~0.03s or loadavg >> cpus
        # means the round ran contended and its timings are inflated
        # uniformly — compare rounds by calibration-normalized numbers.
        "contention": {
            "cpus_online": os.cpu_count(),
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in load_end],
            "calibration_sec_start": calib_start,
            "calibration_sec_end": calib_end,
        },
    }
    # Full detail (fixture sizes, contention sentinel, floor-adjusted
    # throughput) on its own line for humans and archaeology...
    print(json.dumps(payload))
    # ...then a compact totals-first CORE line as the FINAL stdout line.
    # The driver records only the last ~2000 bytes of stdout and parses
    # the JSON it finds there; BENCH_r08's single verbose line outgrew
    # that window ("parsed": null — the {"metric": ... prefix was cut
    # off). The core line carries the contract fields (metric, value,
    # unit, sf, per-query seconds) plus the raw throughput legs, minified
    # and size-guarded so it always parses.
    core: dict = {"metric": payload["metric"], "value": payload["value"],
                  "unit": payload["unit"], "sf": payload["sf"],
                  "queries": {k: round(v, 2) for k, v in timings.items()}}
    for k in ("cdc_stream_rows_per_sec", "cdc_stream_addbatch_rows_per_sec",
              "txn_assembly_rows_per_sec",
              "socket_ingest_rows_per_sec",
              "socket_ingest_datapath_rows_per_sec",
              "bootstrap_snapshot_rows_per_sec",
              "bootstrap_datapath_rows_per_sec", "job_floor_sec"):
        core[k] = payload[k]
    line = json.dumps(core, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never overflow the window
        core.pop("queries")
        line = json.dumps(core, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
