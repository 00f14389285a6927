"""Generate a LOCAL sf1 dataset (~10x sf0.1) for the scale-proof leg
(round-7 verdict item #2). /root/testdata is read-only and the driver's
generator isn't in-repo, so sf1 is synthesized from sf0.1: ten
key-shifted copies per fact table, with per-copy perturbations chosen so
the data KEEPS its statistical shape instead of degenerating:

* orders/lineitem/events: keys shift into disjoint ranges per copy —
  grouping cardinalities, change-mix arithmetic, and join selectivities
  scale linearly, exactly what a bigger TPC-H sf gives.
* documents: doc_ids shift AND every 9th word (a per-copy phase) is
  tagged — ten verbatim copies of every doc would multiply near-dup
  CLUSTER SIZES instead of corpus size, turning the LSH candidate-pair
  count superlinear and invalidating the scaling measurement. The tag
  breaks cross-copy shingle overlap while in-copy near-dup structure
  (the thing being measured) is untouched.
* embeddings: vec_ids shift; vectors get deterministic hash-noise large
  enough to decorrelate copies (fresh points, not 10 co-located
  clouds).
* dimension tables (region nation customer supplier part) copy as-is —
  at real sf1 they'd grow too, but none of the measured queries touch
  them, and keeping them broadcast-sized matches their role.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sfdata/sf1)
Deterministic — no RNG, all perturbations are hash/arithmetic on keys.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ru_cdc_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _shift(df, key_cols: list[str], k: int, spans: dict[str, int]):
    out = df
    for c in key_cols:
        out = out.withColumn(c, F.col(c) + F.lit(k * spans[c]))
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-sf1")

    def src(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    for t in ("region", "nation", "customer", "supplier", "part"):
        src(t).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: copied")

    def union_copies(build):
        parts = [build(k) for k in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    orders = src("orders")
    ospan = orders.agg(F.max("o_orderkey")).first()[0] + 1
    union_copies(lambda k: _shift(orders, ["o_orderkey"], k,
                                  {"o_orderkey": ospan})) \
        .repartition(64).write.mode("overwrite") \
        .parquet(f"{out_dir}/orders.parquet")
    print("orders: x10")

    li = src("lineitem")
    union_copies(lambda k: _shift(li, ["l_orderkey"], k,
                                  {"l_orderkey": ospan})) \
        .repartition(64).write.mode("overwrite") \
        .parquet(f"{out_dir}/lineitem.parquet")
    print("lineitem: x10")

    ev = src("events")
    espan = ev.agg(F.max("event_id")).first()[0] + 1
    union_copies(lambda k: _shift(ev, ["event_id"], k,
                                  {"event_id": espan})) \
        .repartition(64).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")
    print("events: x10")

    docs = src("documents")
    dspan = docs.agg(F.max("doc_id")).first()[0] + 1

    def doc_copy(k):
        d = _shift(docs, ["doc_id"], k, {"doc_id": dspan})
        if k == 0:
            return d
        # tag every 9th word at a per-copy phase: kills cross-copy
        # shingle overlap, preserves in-copy near-dup structure
        words = F.split(F.col("text"), " ")
        tagged = F.transform(
            words, lambda w, i: F.when(i % 9 == F.lit(k % 9),
                                       F.concat(F.lit(f"z{k}"), w))
            .otherwise(w))
        d = d.withColumn("text", F.array_join(tagged, " "))
        return d.withColumn("n_chars", F.length("text"))

    union_copies(doc_copy).repartition(64).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")
    print("documents: x10")

    emb = src("embeddings")
    vspan = emb.agg(F.max("vec_id")).first()[0] + 1

    def emb_copy(k):
        e = _shift(emb, ["vec_id"], k, {"vec_id": vspan})
        if k == 0:
            return e
        # deterministic hash-noise per (vec_id, dim): decorrelates
        # copies into fresh points in the same envelope
        noise = F.transform(
            F.col("embedding"),
            lambda x, i: (x + (F.pmod(F.xxhash64(F.col("vec_id"),
                                                 i, F.lit(k)), 2000)
                               - 1000).cast("float") / 1000.0)
            .cast("float"))
        return e.withColumn("embedding", noise)

    union_copies(emb_copy).repartition(16).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")
    print("embeddings: x10")
    print(f"DONE -> {out_dir}")


if __name__ == "__main__":
    main()
