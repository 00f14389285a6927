"""Physical-plan quality gates: the 100 TB discipline, enforced.

Each assertion encodes a property that must survive a 1000-executor
scale-up: predicates reach the parquet scan, scans prune columns,
dimension joins broadcast, narrow pipelines don't shuffle.
"""

from __future__ import annotations

from ru_cdc_spark.plans import (
    assert_pruned,
    assert_pushed,
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    physical_plan,
)
from ru_cdc_spark.queries import REGISTRY


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    assert_pushed(df, "l_shipdate")
    # lineitem has 11 columns; Q1 needs 7
    assert_pruned(df, table_cols=11, max_read_cols=7)


def test_q3_pushdown_and_broadcast(spark, sf_dir):
    df = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    assert_pushed(df, "l_shipdate")
    assert_pushed(df, "o_orderdate")
    assert_pushed(df, "c_mktsegment")
    assert has_broadcast_join(df)


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # supp/cust/nation/region


def test_knn_broadcasts_queries_no_corpus_shuffle(spark, sf_dir):
    df = REGISTRY["knn_brute_force"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    # only the spread() repartition + the window shuffle are acceptable
    assert count_exchanges(df) <= 3


def test_change_stream_is_narrow(spark, sf_dir):
    """The CDC derivation + envelope is projection/union only — zero
    shuffles beyond the local-parallelism spread."""
    df = REGISTRY["cdc_change_stream"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1  # just the spread() round-robin


def test_routing_prunes_columns(spark, sf_dir):
    df = REGISTRY["cdc_route"].fn(spark, sf_dir)
    # customer has 5 columns; routing needs only c_custkey + c_mktsegment
    assert_pruned(df, table_cols=5, max_read_cols=2)


def test_join_strategy_hints(spark, sf_dir):
    """Join strategy is controllable per join: SHUFFLE_HASH and MERGE
    hints produce the hinted physical operators (the knob for when AQE's
    choice is wrong at scale)."""
    from ru_cdc_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sh = li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
    assert "ShuffledHashJoin" in physical_plan(sh)
    sm = li.join(orders.hint("MERGE"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in physical_plan(sm)


def test_partition_pruning_on_partitioned_output(spark, sf_dir, tmp_path):
    """Writing partitionBy(year) and filtering on the partition column
    prunes directories at the scan (PartitionFilters non-empty, a single
    partition read) — the storage-layout half of scale design."""
    from pyspark.sql import functions as F

    from ru_cdc_spark.sources.readers import load_table

    out = str(tmp_path / "orders_by_year")
    (load_table(spark, sf_dir, "orders")
     .withColumn("order_year", F.year("o_orderdate"))
     .write.mode("overwrite").partitionBy("order_year").parquet(out))

    df = spark.read.parquet(out).where(F.col("order_year") == 1995) \
        .select("o_orderkey")
    plan = formatted_plan(df)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "order_year" in m.group(1), plan[:1500]
    assert df.count() > 0


def test_merge_single_pk_shuffle(spark, sf_dir):
    df = REGISTRY["cdc_merge_snapshot"].fn(spark, sf_dir)
    # spread + one PK exchange for the window
    assert count_exchanges(df) <= 2


def test_catalog_broadcast_lookup_plan_is_o1_in_catalog_size(spark, sf_dir):
    """The 10k-table catalog join must be one BroadcastHashJoin and the
    plan must not embed per-table predicate text."""
    df = REGISTRY["catalog_broadcast_lookup"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    # a driver-dict formulation would inline thousands of table names;
    # the data-plane plan stays small regardless of catalog size
    assert len(plan) < 20_000


def test_catalog_to_dataframe_round_trip(spark):
    from ru_cdc_spark.catalog import (
        FieldMeta,
        TableCatalog,
        TableSchema,
        annotate_stream_with_catalog,
        catalog_to_dataframe,
    )

    cat = TableCatalog()
    cat.register(TableSchema("db0", "live", [FieldMeta("id", "bigint", True)],
                             version=3))
    cat.register(TableSchema("db0", "gone", [FieldMeta("id", "bigint", True)]))
    cat.mark_dropped("db0", "gone")
    cdf = catalog_to_dataframe(spark, cat)
    assert [tuple(r) for r in cdf.collect()] == [("db0", "live", 3, "id", 1)]

    stream = spark.createDataFrame(
        [(1, "db0", "live"), (2, "db0", "gone"), (3, "db0", "unknown")],
        "id long, database string, table string")
    out = annotate_stream_with_catalog(stream, cdf)
    assert [r["id"] for r in out.collect()] == [1]


def test_global_topk_avoids_full_sort(spark, sf_dir):
    df = REGISTRY["top_orders_global"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    # a global Sort node would mean a full-table sort — the thing to avoid
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_q2_argmin_single_fact_pass(spark, sf_dir):
    """Q2 shape: the fact table is read once — the per-part argmin runs on
    the aggregated (part, supp) relation, not a second lineitem scan — and
    every dim join broadcasts."""
    df = REGISTRY["q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.lower().count("lineitem.parquet") == 1  # single fact scan
    assert has_broadcast_join(df)
    # agg shuffle + window shuffle + spread; no extra fact-side exchanges
    assert count_exchanges(df) <= 3


def test_q10_pushdown_and_post_agg_annotate(spark, sf_dir):
    """Q10 shape: date + returnflag predicates reach the scans; customer
    and nation attach by broadcast AFTER the per-custkey aggregate."""
    df = REGISTRY["q10_returned_item_revenue"].fn(spark, sf_dir)
    assert_pushed(df, "l_returnflag")
    assert_pushed(df, "o_orderdate")
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_q11_semi_join_broadcasts(spark, sf_dir):
    """Q11 shape: the nation-filtered supplier set reaches lineitem as a
    broadcast LeftSemi — the fact table never shuffles for the filter."""
    df = REGISTRY["q11_important_part_value"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_q20_threshold_is_division_free(spark, sf_dir):
    """The 1.5x-average predicate compiles to decimal multiplies only —
    no Divide in the plan whose rounding could diverge from the oracle."""
    df = REGISTRY["q20_excess_quantity_suppliers"].fn(spark, sf_dir)
    assert "divide" not in formatted_plan(df).lower()


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter semi-join reduction: when the big side of a
    shuffle join faces a selectively-filtered build side, Catalyst injects
    bloom_filter_agg on the build side and a might_contain guard on the
    fact scan — rows that cannot join die before the shuffle. This is the
    100 TB shuffle reducer for fact⋈filtered-fact joins (thresholds here
    are shrunk to demonstrate on local data; production defaults trigger
    at real sizes)."""
    from pyspark.sql import functions as F
    from ru_cdc_spark.sources.readers import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_doc_chunking_is_exchange_free(spark, sf_dir):
    """Chunking explodes only the chunk-index sequence and slices the
    carried token array — a pure narrow map fused into the scan."""
    df = REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_pareto_frontier_broadcasts_calendar_window(spark, sf_dir):
    """The skyline's window runs over per-date maxima and is broadcast
    back onto the fact scan — the fact table itself is never sorted."""
    df = REGISTRY["orders_pareto_frontier"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    # the only Sort feeds the per-date window, downstream of the date agg
    assert plan.count("Sort") <= 2


def test_anomalies_broadcast_stats_no_fact_shuffle(spark, sf_dir):
    """Z-score filter joins broadcast per-type stats onto the fact scan;
    the fact side must not shuffle on its way into the join."""
    df = REGISTRY["events_value_anomalies"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_part_affinity_broadcasts_supports(spark, sf_dir):
    """Pair counting shuffles once on orderkey; per-part supports arrive
    via broadcast, and the global top-k avoids a full sort."""
    df = REGISTRY["part_affinity"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in plan


def test_transition_matrix_single_user_shuffle(spark, sf_dir):
    """The Markov matrix shuffles the fact once on user_id for the lag
    window; per-type totals join back via broadcast."""
    df = REGISTRY["events_transition_matrix"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_oov_vocab_broadcasts(spark, sf_dir):
    """OOV membership joins the 1000-term vocabulary via broadcast — the
    exploded token stream itself is never shuffled for the join."""
    df = REGISTRY["text_oov_rate"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_error_alerts_broadcast_totals(spark, sf_dir):
    """Global totals arrive as a 1-row broadcast nested loop, not a
    collect or a repeated scan aggregation on the hot path."""
    df = REGISTRY["error_rate_alerts"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_binlog_wire_decode_is_shuffle_free(spark, sf_dir):
    """Byte decode is two chained mapInPandas narrow maps — the only
    exchange is the generator's initial round-robin repartition."""
    df = REGISTRY["binlog_wire_decode"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1


def test_binlog_wire_cdc_snapshot_single_pk_shuffle(spark, sf_dir):
    """Bytes -> snapshot adds exactly one aggregation shuffle (the PK
    merge) on top of the generator's repartition."""
    df = REGISTRY["binlog_wire_cdc_snapshot"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_salted_agg_is_two_phase(spark, sf_dir):
    """The salted aggregate must shuffle twice — (key, salt) then key —
    and never collapse back into a single hot-key exchange."""
    df = REGISTRY["skew_salted_user_totals"].fn(spark, sf_dir)
    n = count_exchanges(df)
    assert 2 <= n <= 3, n


def test_time_travel_pushes_horizon_into_scan_side(spark, sf_dir):
    """The AS OF filter must sit below the merge aggregate (applied while
    scanning the log, not after materializing latest-wins state). Node ids
    in the formatted plan grow toward the root, so the horizon Filter's id
    must be smaller than every aggregate's."""
    import re

    plan = formatted_plan(REGISTRY["cdc_time_travel"].fn(spark, sf_dir))
    filt_ids = [int(m.group(1)) for m in re.finditer(
        r"\((\d+)\) Filter\nInput[^\n]*\nCondition[^\n]*30000", plan)]
    agg_ids = [int(m.group(1)) for m in re.finditer(
        r"(?:Sort|Hash)Aggregate \((\d+)\)", plan)]
    assert filt_ids and agg_ids, plan[:500]
    assert min(filt_ids) < min(agg_ids)


def _unpartitioned_window_count(plan: str) -> int:
    """windowspecdefinition whose FIRST argument is already a sort
    expression = a window with an empty partition spec — the single-task
    global sort the two-pass rankops rewrite exists to eliminate."""
    import re

    return len(re.findall(
        r"windowspecdefinition\([^,()]+ (?:ASC|DESC)", plan))


def test_rfm_has_no_unpartitioned_window(spark, sf_dir):
    """Round-2 verdict follow-up: ntile quartiles run as distributed
    two-pass ranks (range exchange + __pid-local windows)."""
    df = REGISTRY["customer_rfm_segments"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "rangepartitioning" in plan


def test_ks_drift_has_no_unpartitioned_window(spark, sf_dir):
    df = REGISTRY["events_ks_drift"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "rangepartitioning" in plan


def test_spearman_has_no_unpartitioned_window(spark, sf_dir):
    df = REGISTRY["numeric_spearman_matrix"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "rangepartitioning" in plan


def test_q2_semi_prunes_fact_before_agg(spark, sf_dir):
    """The filtered part dim semi-joins onto lineitem BEFORE the
    (part, supp) aggregation — node ids grow toward the root, so the
    semi join's id must be smaller than the first aggregate's."""
    import re

    plan = formatted_plan(REGISTRY["q2_min_cost_supplier"].fn(spark, sf_dir))
    semi_ids = [int(m.group(1)) for m in re.finditer(
        r"BroadcastHashJoin LeftSemi[^(\n]*\((\d+)\)", plan)]
    agg_ids = [int(m.group(1) or m.group(2)) for m in re.finditer(
        r"(?:Sort|Hash)Aggregate \((\d+)\)|\((\d+)\) (?:Sort|Hash)Aggregate",
        plan)]
    assert semi_ids, plan[:800]
    assert agg_ids and min(semi_ids) < min(agg_ids), (semi_ids, agg_ids)


def test_socket_snapshot_single_pk_shuffle(spark, sf_dir):
    """Socket-ingested CDC snapshot: narrow socket read + Arrow decode,
    then exactly one PK shuffle for the latest-wins merge."""
    df = REGISTRY["mysql_socket_cdc_snapshot"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2
    plan = physical_plan(df)
    assert "max_by" in plan or "MaxBy" in plan


def test_png_decode_is_exchange_free(spark, sf_dir):
    """Real PNG encode+decode runs as chained narrow Arrow maps — no
    shuffle anywhere in the plan."""
    df = REGISTRY["multimodal_png_decode"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_pq_rerank_broadcasts_codebook_and_queries(spark, sf_dir):
    df = REGISTRY["ann_pq_rerank"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # codebook + query table


def test_corpus_dedup_anti_join_not_forced_broadcast(spark, sf_dir):
    """The survivors-vs-corpus anti join's build side is the clustered
    doc-id set — unbounded at web scale (30-50% of docs), so it must
    NOT carry a broadcast hint: under a forced-low threshold the
    planner has to be free to shuffle it."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        df = REGISTRY["corpus_dedup_retain"].fn(spark, sf_dir)
        plan = physical_plan(df)
        # the LeftAnti join must be a shuffle-based strategy here; a
        # broadcast hint would override the threshold and pin
        # BroadcastHashJoin ... LeftAnti into the plan
        import re

        anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti_lines, "anti join missing from plan"
        assert not any(re.search(r"Broadcast\w*Join", ln)
                       for ln in anti_lines), anti_lines
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_boilerplate_strip_broadcasts_tiny_boiler_set(spark, sf_dir):
    """The boilerplate set (chunks in >=3 docs) is tiny by construction
    — the anti join must broadcast it, never shuffle the corpus side
    for it."""
    df = REGISTRY["corpus_boilerplate_strip"].fn(spark, sf_dir)
    plan = physical_plan(df)
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), anti


def test_media_decode_is_exchange_free(spark, sf_dir):
    """Payload encode+decode are payload-local narrow maps — nothing
    shuffles; only derived metrics leave the operator."""
    df = REGISTRY["multimodal_media_decode"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1  # at most the source spread


def test_stemmed_terms_topk_avoids_full_sort(spark, sf_dir):
    """Global top-k over stem counts must be TakeOrderedAndProject,
    never a full sort."""
    df = REGISTRY["corpus_stemmed_terms"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_nfc_normalize_is_exchange_free(spark, sf_dir):
    """Normalization is a payload-local narrow map — nothing
    shuffles."""
    df = REGISTRY["corpus_nfc_normalize"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1  # at most the source spread


def test_bpe_token_counts_single_corpus_shuffle(spark, sf_dir):
    """BPE: encoding itself is a broadcast-merges narrow map; the only
    corpus-sized shuffle in the whole plan is the word-frequency
    groupBy inside training (which is a separate, bounded-output job).
    The COUNTING DataFrame must be exchange-free."""
    from ru_cdc_spark.operators.bpe import bpe_token_counts
    from ru_cdc_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    # tiny merge table: the plan shape is independent of its content
    df = bpe_token_counts(docs, [(116, 104, 257)])
    assert count_exchanges(df) == 0


def test_span_strip_gram_shuffle_carries_no_text(spark, sf_dir):
    """The duplicate-gram aggregation must shuffle (hash, doc, pos)
    triples, never document text: no Exchange in the plan may carry a
    `text` or `word` column upstream of the final rebuild join."""
    df = REGISTRY["text_duplicate_span_strip"].fn(spark, sf_dir)
    plan = physical_plan(df)
    # the cross-gram detection aggregates on the md5 hash
    assert "count(distinct doc_id" in plan.lower() \
        or "count(doc_id" in plan.lower()


def test_span_strip_all_jvm_mapside_rebuild_shape(spark, sf_dir):
    """Gates for the strip plan's load-bearing properties: pure JVM
    (no Python stage anywhere — the operator is SQL functions end to
    end) and the r13 map-side rebuild — covered positions aggregate to
    one small per-doc int array (collect_set) that is BROADCAST back
    onto the document scan, so the full word stream never shuffles
    (the pre-r13 anti-join shape re-assembled every word through a
    groupBy(doc_id) exchange)."""
    df = REGISTRY["text_duplicate_span_strip"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan \
        and "BatchEvalPython" not in plan
    assert "collect_set" in plan
    # the rebuild join strategy is AQE's call (r14): the covered side
    # is per-affected-doc and data-dependent, so a FORCED broadcast
    # was a 100 TB hazard — accept whichever equi-join the runtime
    # stats pick (broadcast at fixture scale, shuffled at corpus
    # scale), but never an anti-join re-assembly of the word stream
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)
    assert "LeftAnti" not in plan


def test_partial_json_decode_is_exchange_free(spark, sf_dir):
    """Type-39 decode is a payload-local narrow map (diff application
    happens against the before-image already in hand)."""
    df = REGISTRY["binlog_partial_json_update"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 1  # at most the fixture spread


def test_warc_ingest_stays_narrow_until_output(spark, sf_dir):
    """WARC ingest: binaryFile scan -> Arrow parse -> projection. The
    record parse must not shuffle archive payloads; the only exchanges
    allowed are the fixture-writing repartition upstream (not part of
    this plan) and none in the read path itself."""
    df = REGISTRY["warc_ingest_documents"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0
    plan = physical_plan(df)
    assert "MapInPandas" in plan  # executor-side record parse


def test_jsonl_zst_ingest_parses_json_jvm_side(spark, sf_dir):
    """Compressed-shard ingest: Python only inflates and splits lines;
    the JSON typing runs as Catalyst's from_json (JVM, codegen), and
    nothing shuffles."""
    df = REGISTRY["jsonl_zst_ingest"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0
    plan = physical_plan(df)
    assert "from_json" in plan
    assert "MapInPandas" in plan


def test_socket_compressed_snapshot_same_shape_as_plain(spark, sf_dir):
    """Compressed transport must not change the plan: narrow socket
    read + Arrow decode + exactly one PK shuffle, identical to the
    plaintext snapshot gate."""
    df = REGISTRY["mysql_socket_compressed_snapshot"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert "MaxBy" in physical_plan(df) or \
        "max_by" in physical_plan(df)


def test_parts_abc_has_no_unpartitioned_window(spark, sf_dir):
    """Round-6 verdict item #7: the ABC running sum runs as the
    distributed two-pass scheme (range exchange + __pid-local windows +
    broadcast decimal offsets) — no single-task ordered window left in
    any headline-family plan."""
    df = REGISTRY["parts_abc_analysis"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "rangepartitioning" in plan


def test_incremental_snapshot_single_pk_shuffle_no_sort(spark, sf_dir):
    """DBLog merge discipline: chunk rows + change events union into
    ONE hash-aggregate PK merge (max_by) — a single pk shuffle, no
    sort, no window; chunk reads and window dumps stay inside the
    Arrow maps."""
    df = REGISTRY["mysql_incremental_snapshot"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert count_exchanges(df) <= 2  # pk hash (+ AQE reads)
    assert "max_by" in plan or "MaxBy" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_ann_batch_queries_single_corpus_scan(spark, sf_dir):
    """Batch-serving ANN discipline (round-9): the WHOLE query batch is
    answered by ONE parquet scan of the corpus — the query side is a
    broadcast local relation (collected, bounded), the L-way code
    explode stays in-flight inside the scan task, and the exact cosine
    is computed in the bucket join (no join back to the corpus)."""
    from ru_cdc_spark.plans import scan_read_schemas

    df = REGISTRY["ann_batch_queries"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert len(scan_read_schemas(df)) == 1, scan_read_schemas(df)
    assert "BroadcastHashJoin" in plan
    # acceptable shuffles: candidate (q_vec, neighbor) hash agg + the
    # per-query window (both on candidate rows, never the corpus)
    assert count_exchanges(df) <= 3, plan[:1200]


def test_corpus_mix_domains_distributed_cumsum(spark, sf_dir):
    """Domain mixing (round 9): the per-domain running sum is the
    distributed two-pass scheme — range exchange + partition-local
    windows — and budgets arrive by broadcast; no unpartitioned window,
    no corpus collect."""
    df = REGISTRY["corpus_mix_domains"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan


def test_events_pattern_match_partitioned_windows_take_ordered(
        spark, sf_dir):
    """Time-series subsequence search (round 9): sliding windows are
    per-user frames (no unpartitioned window), and the global top-N is
    a TakeOrdered, never a full sort."""
    df = REGISTRY["events_pattern_match"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert _unpartitioned_window_count(plan) == 0, plan[:800]
    assert "TakeOrderedAndProject" in plan


def test_zorder_layout_no_sort_no_window(spark, sf_dir):
    """Z-order layout (round 10): cell assignment is pure per-row
    integer arithmetic — NO global sort, NO window anywhere; the only
    exchanges are the groupBy(cell) hash shuffles with map-side
    partials (HashAggregate before the exchange)."""
    df = REGISTRY["zorder_layout_stats"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" not in plan, plan[:800]
    assert "rangepartitioning" not in plan  # no global sort exchange
    assert "HashAggregate" in plan


def test_audio_spectral_single_pass_no_shuffle(spark, sf_dir):
    """Audio spectral (round 10): synthesize -> decode -> FFT is one
    mapInPandas chain over the documents scan — payload bytes never
    shuffle."""
    df = REGISTRY["multimodal_audio_spectral"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan[:800]
    assert plan.count("MapInPandas") == 2  # synth + analyze


def test_dpp_join_has_dynamic_pruning_expression(spark, sf_dir,
                                                 tmp_path):
    """Dynamic Partition Pruning (round 10): the fact scan's partition
    filters must carry the runtime dynamicpruningexpression subquery
    (the dim's filter is on a non-partition attribute, so planning-time
    pruning is impossible), and the dim side must broadcast."""
    from ru_cdc_spark.queries import build_dpp_join
    from ru_cdc_spark.sources.layout import write_hive_partitioned
    from ru_cdc_spark.sources.readers import load_table

    out = str(tmp_path / "orders_by_priority")
    write_hive_partitioned(load_table(spark, sf_dir, "orders"), out,
                           ["o_orderpriority"])
    plan = physical_plan(build_dpp_join(spark, out))
    assert "dynamicpruning" in plan.lower(), plan[:800]
    assert "BroadcastHashJoin" in plan
