"""Dump formatted physical plans for representative queries to PLANS.md.

Run: python tools/plan_audit.py [sf_dir]

The output is the reviewable artifact for the 100 TB discipline: every
plan should show predicates inside the parquet scan (PushedFilters),
pruned read schemas, broadcast joins on dimension sides, and
whole-stage codegen over the hot expressions. tests/test_plans.py
asserts the critical properties; this file makes them human-auditable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.plans import formatted_plan  # noqa: E402
from ru_cdc_spark.queries import REGISTRY  # noqa: E402
from ru_cdc_spark.session import get_spark  # noqa: E402

AUDIT = [
    ("q1_pricing_summary", "filter pushdown + partial agg before one shuffle"),
    ("q3_shipping_priority", "dim broadcast + single fact co-shuffle"),
    ("q2_min_cost_supplier", "single fact scan; argmin window on post-agg relation"),
    ("q9_product_profit", "all dims broadcast; one orderkey shuffle"),
    ("cdc_envelope", "shuffle-free codegen'd envelope pipeline"),
    ("cdc_merge_snapshot", "max_by partial agg latest-wins (no sort)"),
    ("top_orders_global", "TakeOrderedAndProject (no global sort)"),
    ("dedup_minhash_lsh_pairs", "shuffle-free signatures; banded candidate join"),
    ("knn_brute_force", "broadcast queries; zero corpus shuffle"),
    ("catalog_broadcast_lookup", "O(1) plan size in catalog cardinality"),
    ("bloom_prune_semi_join",
     "Bloom probe predicate inside the fact scan stage; exchange input "
     "pre-pruned before the exact semi-join"),
    ("text_repetition_signals", "one exchange serves all three agg levels"),
    ("events_funnel", "single user-keyed shuffle; codegen'd array fold"),
    ("orders_pareto_frontier",
     "frontier window over calendar-bounded per-date maxima, broadcast back"),
    ("events_value_anomalies",
     "one stats pass broadcast onto the fact scan; no fact shuffle"),
    ("binlog_wire_decode",
     "byte decode as chained narrow Arrow maps — no shuffle"),
    ("binlog_wire_cdc_snapshot",
     "bytes -> merge snapshot: exactly one PK aggregation shuffle"),
    ("skew_salted_user_totals",
     "two-phase salted aggregate: (key, salt) shuffle then key shuffle"),
    ("cdc_time_travel",
     "AS OF horizon filter below the latest-wins merge aggregate"),
    ("incremental_join_revenue",
     "delta side narrow; one lineitem shuffle co-partitioned with the join"),
    ("binlog_txn_changes",
     "per-segment transactional assembly: narrow Arrow map, zero shuffle"),
    ("cdc_change_data_feed",
     "CDF diff: two PK merges + one full-outer join on the same PK"),
    ("frequent_terms_exact",
     "Misra-Gries candidates broadcast; no full-cardinality term shuffle"),
    ("weighted_priority_sample",
     "hash-uniform priorities fused into the scan; one stratum window"),
    ("numeric_corr_matrix",
     "fact collapses to ONE exact-moment row before the pair explosion"),
    ("lineitem_metrics_unpivot",
     "UNPIVOT Expand inside the scan stage — one fact read for all metrics"),
    ("terms_count_min_estimate",
     "CMS cells bounded by depth x width; probe side broadcast"),
    ("cdc_variant_payload",
     "parse_json once; every variant_get is a binary lookup, no re-parse"),
    ("copurchase_triangles",
     "degree-oriented wedge join: fan-out bounded by O(sqrt m)"),
    ("events_ks_drift",
     "windows over the distinct-value relation, not the event stream; "
     "round 3: __pid-partitioned two-pass running sums, no unpartitioned "
     "window"),
    ("customer_rfm_segments",
     "round 3: ntile quartiles as distributed two-pass ranks "
     "(rangepartitioning exchanges, __pid-local windows)"),
    ("numeric_spearman_matrix",
     "round 3: tie-group average ranks from distinct-value cumulative "
     "counts joined back — no fact-table rank window"),
    ("ann_pq_rerank",
     "broadcast codebooks; min_by encode agg; ADC shortlist then exact "
     "rerank on |queries| x shortlist vectors"),
    ("mysql_socket_cdc_snapshot",
     "per-task socket dumps (narrow mapInPandas) -> Arrow byte decode -> "
     "single PK max_by shuffle"),
    ("multimodal_png_decode",
     "real PNG encode+decode as chained narrow Arrow maps; only 4 longs "
     "per image leave the operator"),
    ("text_duplicate_span_strip",
     "all-JVM exact-substring strip: uniform gram-hash shuffle, "
     "K x dup-occurrence-bounded coverage, anti-join BEFORE the rebuild "
     "aggregate (A/B-beat every flag-carrying consolidation)"),
    ("text_bpe_word_freq",
     "the Sennrich decomposition's one corpus shuffle: word -> count "
     "with map-side partial agg; vocabulary-bounded collect"),
    ("text_bpe_token_counts",
     "BPE encode as a broadcast-merges narrow Arrow map; zero shuffle "
     "before the final count agg"),
    ("warc_ingest_documents",
     "one task per WARC shard (binaryFile scan), record parse inside "
     "Arrow batches — no shuffle"),
    ("jsonl_zst_ingest",
     "binaryFile shard scan -> executor-side zstd inflate + line split "
     "-> JVM from_json; no shuffle"),
    ("parts_abc_analysis",
     "round 7: ABC running sum + rank as distributed two-pass scheme "
     "(rangepartitioning, __pid-local windows, broadcast decimal "
     "offsets) — no unpartitioned window in any headline family"),
    ("binlog_metadata_full_decode",
     "WL#4618 catalog-free decode: two narrow Arrow maps, zero "
     "shuffle, column names off the wire"),
    ("mysql_legacy_type_semantics",
     "pre-5.6 temporals + GEOMETRY passthrough: narrow Arrow maps, "
     "zero shuffle"),
    ("mysql_incremental_snapshot",
     "DBLog incremental snapshot: chunk tasks + change-stream slices "
     "union into ONE hash-aggregate PK merge (max_by) — a single "
     "shuffle on the pk, no window, no sort"),
    ("mysql_socket_bootstrap_stream",
     "streaming bootstrap handoff: decoded frames (snapshot + live, "
     "one wire format, one decoder) -> single PK hash merge; the "
     "stream side is offset-log-driven, nothing here re-reads it"),
    ("binlog_minimal_image_merge",
     "round 8: binlog_row_image=MINIMAL sparse images -> per-column "
     "latest-present max_by merge — ONE PK shuffle, partial_max_by "
     "collapses map-side before it (string-valued buffers make Spark "
     "pick SortAggregate; the shuffle-volume property is identical), "
     "no window"),
    ("mysql_socket_metadata_snapshot",
     "round 8: catalog-free WL#4618 decode fused INTO the dump task "
     "(one mapInPandas; frame bytes never cross the JVM) -> single PK "
     "max_by shuffle; zero DESC round-trips in the plan"),
    ("corpus_pack_windows",
     "round 8: GPT-style window packing as the distributed running sum "
     "(rangepartitioning + pid-local windows + broadcast offsets) — "
     "token stream never materialized, no single-task window"),
    ("corpus_decontaminate",
     "round 8: benchmark grams broadcast; corpus gram stream hits a "
     "BroadcastHashJoin with zero corpus shuffle before the per-doc "
     "hit count"),
    ("ann_lsh_tables",
     "round 8: L-tables hyperplane LSH — codes are narrow per-row "
     "expressions, candidates via (table, bucket) equi-join with the "
     "query side broadcast, exact rerank on the deduped union"),
    ("ann_batch_queries",
     "round 9: batch serving over the L-tables index — ONE parquet "
     "scan of the corpus answers the whole broadcast query batch; "
     "cosine computed in the bucket join (no join back), only "
     "candidate pairs shuffle"),
    ("mysql_geometry_decode",
     "round 9: type-255 WKB decode as one narrow Arrow map — SRID + "
     "typed coordinates + WKT off the wire bytes, zero shuffle"),
    ("corpus_mix_domains",
     "round 9: domain mixing — 20-row budget aggregate broadcast, "
     "per-domain running sum as the distributed two-pass scheme, "
     "no unpartitioned window, no corpus collect"),
    ("events_pattern_match",
     "round 9: time-series subsequence search — per-user "
     "rows-between frames (no unpartitioned window), literal "
     "pattern, TakeOrderedAndProject top-N"),
    ("corpus_length_buckets",
     "round 10: power-of-two buckets in pure integer arithmetic "
     "(shiftleft over bin-length, no float log2) — narrow token "
     "projection, log-cardinality partial agg"),
    ("cdc_scd2_history",
     "round 13: SCD2 version intervals — ONE PK-hash exchange feeding "
     "the per-key LEAD window; no self-join, closing edges read off "
     "the sorted partition"),
    ("corpus_shuffle_shards",
     "round 13: seeded epoch-shuffle sharding — hash exchange on "
     "shard + within-partition sort; NO global sort / single-reducer "
     "ntile anywhere in the plan"),
]


def _elide_literal_arrays(plan: str) -> str:
    """Collapse huge constant-folded literal arrays (e.g. Bloom filter
    words) to keep the dumped plan readable — display only."""
    import re

    return re.sub(
        r"\[(?:-?\d+,){16,}-?\d+\]",
        lambda m: f"[<{m.group(0).count(',') + 1}-element literal elided>]",
        plan)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", cpus=4, shuffle_partitions=4)
    lines = [
        "# PLANS — formatted physical plans for headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. What to look",
        "for per plan is noted above each block; the hard properties are",
        "asserted in `tests/test_plans.py`.",
        "",
    ]
    for name, why in AUDIT:
        df = REGISTRY[name].fn(spark, sf_dir)
        lines += [f"## {name}", "", f"*Property:* {why}", "", "```",
                  _elide_literal_arrays(formatted_plan(df).rstrip()),
                  "```", ""]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
