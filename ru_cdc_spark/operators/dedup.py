"""Deduplication operators for LLM-training-data pipelines.

Five strategies over the ``documents`` / ``embeddings`` tables, each the
Spark-idiomatic shape of a published technique:

* exact        — hash-groupBy on normalized text (one shuffle on the hash)
* MinHash+LSH  — shingle -> per-seed min-hash signature -> banded bucket
                 join (Broder'97 / MMDS ch.3 structure)
* SimHash      — per-word hash bit-vote -> 32-bit fingerprint (Charikar'02)
* n-gram Jaccard — blocked pairwise set similarity
* embedding cosine — near-dup by vector similarity within coarse buckets

Cross-engine determinism: all hashing is md5 (identical hex in Spark and
DuckDB); integer conversion takes the first 8 md5 hex chars (Spark ``conv``,
DuckDB ``'0x...'::BIGINT``); float similarity uses sequential folds that are
bit-identical to DuckDB's list functions (see functions/vector.py).

Scale design (the part that matters at 100 TB):
- MinHash/SimHash signatures are per-row array math — ZERO shuffle; the
  only shuffle in the whole dedup path is the band-bucket self-join.
- LSH band join is an equi-join on (band_idx, band_hash) — Spark
  shuffle-hash; hot buckets (boilerplate docs) are the classic skew source,
  mitigated by AQE skew-join plus a bucket-size cap (drop pathological
  buckets > N docs, standard practice in web-scale dedup).
- nothing is pairwise across the full corpus: candidate pairs only within
  LSH buckets / blocking keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ru_cdc_spark.sources.readers import load_table, spread

N_MINHASH = 8          # signature length (4 bands x 2 rows)
N_BANDS = 4
SIMHASH_BITS = 32

# Carter-Wegman permutation family for MinHash: shingle -> 32-bit base hash
# h (md5 prefix, computed ONCE), then mh_s = min((a_s*h + b_s) mod P).
# P prime > 2^32; a_s < 2^31 keeps a*h < 2^63 (no BIGINT overflow on either
# engine). One md5 per shingle instead of one per (seed, shingle) — 8x less
# hashing, and the mins are int64 comparisons instead of hex-string ones.
MINHASH_P = 4294967311
MINHASH_AB = [
    (1610612741, 402653189), (805306457, 201326611),
    (1402796197, 842065411), (926167529, 370333141),
    (1073741827, 536870923), (668265263, 285058399),
    (1431655777, 715827883), (2013265921, 113246209),
]

# --- shared text normalization (identical in Spark and DuckDB SQL) ---------


def words_col(text: Column) -> Column:
    """lower -> strip non-alnum -> split on whitespace -> drop empties."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), r"\s+"),
        lambda w: w != "",
    )


_WORDS_SQL = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ', 'g'), '\\s+'), w -> w <> '')"
)

_WORDS_CTE = f"WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents)\n"


# ===========================================================================
# exact dedup
# ===========================================================================


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on md5 of text, keep lowest doc_id as canonical.

    Scale: single shuffle keyed by the 128-bit hash (uniform by
    construction — no skew), map-side partial agg keeps it cheap.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_doc_id"),
             F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# ===========================================================================
# MinHash signatures + LSH banding
# ===========================================================================


def _shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs, distinct — k-word shingles."""
    w = F.col("w")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .where(F.size("w") >= k)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: each shingle hashes ONCE (32-bit md5
    prefix), then the s-th signature slot is min((a_s*h + b_s) mod P) over
    the doc's shingles — the Carter-Wegman permutation family (Broder'97).

    Scale: the signature is a function of each doc's OWN shingles, so it
    is computed entirely inside a narrow projection (array ops per row) —
    ZERO shuffle. Only the downstream LSH band join ever shuffles. (An
    explode+groupBy formulation computes the same values but pays a full
    shuffle of the shingle set — pointless for a per-row aggregate.) The
    single-md5 + integer-permutation form is ~N_MINHASH x cheaper per
    shingle than hashing per (seed, shingle).
    """
    return minhash_signatures_of(
        spread(load_table(spark, sf_dir, "documents")))


def minhash_signatures_of(docs: DataFrame) -> DataFrame:
    """:func:`minhash_signatures` over an arbitrary documents frame —
    the form streaming ingestion needs (each arriving micro-batch is
    banded in place, same per-row math, zero shuffle).

    r14 (guide §4.2): the shingle -> md5 -> 8-permutation-min pipeline
    runs as ONE Arrow-vectorized pandas-UDF pass instead of the
    interpreted higher-order-function chain (shingle transform, md5
    transform, and 8 array_min(transform) folds — HOFs have no codegen,
    so every element paid interpreted-expression overhead 10 times).
    Tokenization stays in the JVM (words_col — codegen regex/split), so
    the kernel sees the exact word arrays the expression form hashed.

    BYTE-IDENTICAL by construction (differential-tested against the
    retained expression form, ``_minhash_signatures_expr_of``):
    shingles are ``" ".join`` of the same words (same UTF-8 bytes ->
    same md5); ``int(hexdigest()[:8], 16)`` == conv(substring(md5,1,8),
    16,10) (< 2^32, fits long exactly); the Carter-Wegman mins run in
    int64 with no overflow (a < 2^31, h < 2^32 => a*h + b < 2^63), and
    numpy int64 %, like Java long %, is exact on these non-negative
    values; min over a set is order-independent, so JVM array_distinct
    vs Python set() cannot matter."""
    k = 3
    base = (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .where(F.size("w") >= k)
    )
    sig = base.select("doc_id", _minhash_kernel(F.col("w")).alias("__mh"))
    return sig.select(
        "doc_id", *[F.col("__mh")[s].alias(f"mh{s}")
                    for s in range(N_MINHASH)])


def _minhash_kernel(col: Column) -> Column:
    """Arrow-vectorized MinHash signature kernel: word array in, the
    N_MINHASH permutation mins out (see minhash_signatures_of for the
    exactness argument)."""
    @F.pandas_udf("array<long>")
    def mh_udf(ws: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        A = np.array([a for a, _ in MINHASH_AB], dtype=np.int64)
        B = np.array([b for _, b in MINHASH_AB], dtype=np.int64)
        md5 = hashlib.md5
        out = []
        for words in ws:
            wl = words.tolist() if hasattr(words, "tolist") else list(words)
            sh = {" ".join(wl[i:i + 3]) for i in range(len(wl) - 2)}
            h = np.fromiter(
                (int(md5(s.encode("utf-8")).hexdigest()[:8], 16)
                 for s in sh),
                dtype=np.int64, count=len(sh))
            out.append(((A * h[:, None] + B) % MINHASH_P).min(axis=0))
        return pd.Series(out)

    return mh_udf(col)


def _minhash_signatures_expr_of(docs: DataFrame) -> DataFrame:
    """The pre-r14 pure-expression form of :func:`minhash_signatures_of`
    — retained as the differential-test anchor for the Arrow kernel
    (tests prove bit-identical signatures on the fixture corpus)."""
    w = F.col("w")
    k = 3
    # slice + array_join (not per-position element_at chains): one array
    # view per shingle — measurably faster in codegen
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(w) - (k - 1)),
        lambda i: F.array_join(F.slice(w, i, k), " "),
    ))
    hashes = F.transform(
        F.col("sh"),
        lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"),
    )
    base = (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .where(F.size("w") >= k)
        .select("doc_id", shingles.alias("sh"))
        .select("doc_id", hashes.alias("h"))
    )

    def mh(seed: int):
        a, b = MINHASH_AB[seed]
        return F.array_min(F.transform(
            F.col("h"), lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)
        )).alias(f"mh{seed}")

    return base.select("doc_id", *[mh(s) for s in range(N_MINHASH)])


_SHINGLES_CTE = _WORDS_CTE + """,
shingles AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM words WHERE len(w) >= 3
    )
)
"""

_HASHED_CTE = _SHINGLES_CTE + """,
hashed AS (
    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h
    FROM shingles
)
"""

MINHASH_SIGNATURES_SQL = _HASHED_CTE + """
SELECT doc_id,
""" + ",\n".join(
    f"       MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{s}"
    for s, (a, b) in enumerate(MINHASH_AB)
) + """
FROM hashed GROUP BY doc_id
"""


def _band_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per doc per band."""
    return band_table_of(minhash_signatures(spark, sf_dir))


# which relation the multi-consumer dedup entries persist: the
# 1-row/doc signature table ("sigs" — band explode re-derives per
# consumer as cheap codegen) or the 4-rows/doc band table ("bands").
# A/B-switchable for measurement; see _shared_band_table.
_PERSIST_STAGE = "sigs"


def _shared_band_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band table persisted for MULTI-CONSUMER use (self-join sides,
    bucket-cap probes, build+probe pairs): the expensive words ->
    shingle-md5 -> 8-permutation pipeline materializes once; which
    intermediate is cached is the measured _PERSIST_STAGE choice.
    Released by release_rank_caches like every tracked persist."""
    from ru_cdc_spark.operators.rankops import _persist_tracked

    if _PERSIST_STAGE == "bands":
        return _persist_tracked(band_table_of(
            minhash_signatures(spark, sf_dir)))
    return band_table_of(_persist_tracked(
        minhash_signatures(spark, sf_dir)))


def band_table_of(docs_or_sigs: DataFrame,
                  n_bands: int | None = None,
                  rows_per_band: int | None = None) -> DataFrame:
    """Band table over an arbitrary frame: accepts either raw documents
    (doc_id, text — banded in place) or precomputed signatures.

    ``n_bands``/``rows_per_band`` default to the session constants
    (N_BANDS, 2); persisted-index maintenance passes the BUILD's values
    (``band_index_banding``) so a corpus-adaptive or reconfigured
    session can never band a probe differently from the index it
    probes."""
    nb = N_BANDS if n_bands is None else int(n_bands)
    rpb = 2 if rows_per_band is None else int(rows_per_band)
    if nb * rpb > N_MINHASH:
        raise ValueError(
            f"banding ({nb} bands x {rpb} rows) needs {nb * rpb} "
            f"minhashes but the signature has {N_MINHASH}")
    sig = (docs_or_sigs if "mh0" in docs_or_sigs.columns
           else minhash_signatures_of(docs_or_sigs))
    return sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws(":", *[F.col(f"mh{rpb * b + r}")
                                         for r in range(rpb)]))
                .alias("band_hash"),
            )
            for b in range(nb)
        ])).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      bucket_cap: int | None = None) -> DataFrame:
    """LSH banding: hash each 2-row band of the signature; docs sharing any
    band hash are candidate near-duplicate pairs.

    Scale: the self-join is an equi-join on (band_idx, band_hash) — only
    bucket-mates pair up. ``bucket_cap`` drops pathological hot buckets
    (boilerplate/templated docs put millions of near-identical pages in
    one bucket; a size-B bucket costs B^2 pairs, so capping is what makes
    web-scale LSH finish — standard practice, and the dropped docs are
    still caught by their other bands unless they are hot everywhere).
    The cap itself is one partial-agg count over the band table — cheap.
    """
    # persist the shared MinHash derivation (r13 persisted the band
    # table; r14 re-settled the stage with the Arrow kernel in place —
    # see _shared_band_table / _PERSIST_STAGE and OPTIMIZATION_r14.md
    # for the A/B): both self-join sides and the bucket-cap probe
    # otherwise re-run the words -> shingle-md5 -> permutation pipeline
    # once per reference. Released after materialization.
    bands = _shared_band_table(spark, sf_dir)
    if bucket_cap is not None:
        small = (bands.groupBy("band_idx", "band_hash")
                 .agg(F.count("*").alias("__n"))
                 .where(F.col("__n") <= bucket_cap)
                 .drop("__n"))
        bands = bands.join(small, ["band_idx", "band_hash"], "left_semi")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs with the hot-bucket cap engaged (cap=3 so it
    demonstrably fires at test scale; production would use ~500)."""
    return minhash_lsh_pairs(spark, sf_dir, bucket_cap=3)


MINHASH_LSH_PAIRS_SQL = _HASHED_CTE + """,
sig AS (
    SELECT doc_id,
""" + ",\n".join(
    f"           MIN(({a} * h + {b}) % {MINHASH_P}) AS mh{s}"
    for s, (a, b) in enumerate(MINHASH_AB)
) + """
    FROM hashed GROUP BY doc_id
),
bands AS (
""" + "\n    UNION ALL\n".join(
    f"    SELECT doc_id, {b} AS band_idx,"
    f" md5(mh{2*b} || ':' || mh{2*b+1}) AS band_hash FROM sig"
    for b in range(N_BANDS)
) + """
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band_idx, band_hash)
WHERE a.doc_id < b.doc_id
"""

MINHASH_LSH_PAIRS_CAPPED_SQL = MINHASH_LSH_PAIRS_SQL.replace(
    "FROM bands a JOIN bands b USING (band_idx, band_hash)",
    """FROM bands a JOIN bands b USING (band_idx, band_hash)
JOIN (SELECT band_idx, band_hash FROM bands
      GROUP BY 1, 2 HAVING COUNT(*) <= 3) ok USING (band_idx, band_hash)""",
)


def _driver_union_find(edge_rows, spark, vtype=None) -> DataFrame:
    """Finish a SMALL edge set driver-side: union-find with path
    compression, representative = min vertex id of the component —
    byte-identical output contract to the distributed fixpoints. This
    is the hybrid every production components implementation runs
    (contraction shrinks the graph; the remainder fits one machine):
    each distributed round costs a multi-exchange job, which dominates
    wall time once the graph is tiny. ``vtype`` is the vertex-id Spark
    type from the input edges, so non-long ids (string doc keys, ints)
    keep the exact type contract the distributed path preserves."""
    from pyspark.sql.types import LongType, StructField, StructType

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    verts = set()
    for u, v in edge_rows:
        verts.add(u)
        verts.add(v)
    out = [(v, find(v)) for v in sorted(verts)]
    vt = vtype or LongType()
    # nullable=True matches the distributed fixpoints' output schema
    # (joins/aggregates mark their outputs nullable)
    schema = StructType([StructField("doc_id", vt, True),
                         StructField("component", vt, True)])
    return spark.createDataFrame(out, schema)


def _vertex_type(e: DataFrame, ucol: str = "u", vcol: str = "v"):
    """The common vertex-id type of an edge frame: what a min/least over
    both columns yields (analysis only — no job)."""
    return e.selectExpr(f"{ucol} AS x").unionByName(
        e.selectExpr(f"{vcol} AS x")).schema["x"].dataType


# graphs at or below this many edges finish driver-side (a few MB);
# above it, the distributed rounds run exactly as before
DRIVER_FINISH_EDGES = 100_000


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 20,
                         driver_finish_edges: int = DRIVER_FINISH_EDGES
                         ) -> DataFrame:
    """Connected components by iterative min-label propagation: every
    vertex adopts the minimum label among itself and its neighbors until
    fixpoint. Returns (vertex, component) with component = min vertex id
    in the component (deterministic canonical representative).

    Scale: each iteration is one join + one groupBy on the vertex id —
    O(diameter) rounds (large-star/small-star halves the rounds if needed).
    The fixpoint check is a driver-side count of changed labels per round
    (an aggregate, not a collect of data). Edge sets at or below
    ``driver_finish_edges`` skip the rounds entirely and finish with
    driver-side union-find (identical output, pytest-equivalence-checked)
    — per-round job overhead dominates on tiny graphs.

    This is the dedup *clustering* step: LSH candidate pairs in, one
    canonical doc per near-duplicate cluster out.
    """
    e0 = edges.selectExpr(f"{src} AS u", f"{dst} AS v")
    if driver_finish_edges:
        # materialize the edge frame ONCE before the size probe: the
        # probe's collect and every propagation round then read the
        # checkpointed blocks instead of re-executing the upstream
        # lineage (e.g. the LSH candidate-pair joins) per job
        e0 = e0.localCheckpoint(eager=True)
        small = e0.limit(driver_finish_edges + 1).collect()
        if len(small) <= driver_finish_edges:
            return _driver_union_find([(r.u, r.v) for r in small],
                                      edges.sparkSession,
                                      _vertex_type(e0))
    sym = e0.selectExpr("u AS a", "v AS b").unionByName(
        e0.selectExpr("v AS a", "u AS b")).distinct()
    verts = sym.select(F.col("a").alias("v")).distinct()
    labels = verts.withColumn("label", F.col("v"))

    def fingerprint(d: DataFrame):
        # decimal(38,0) accumulator: a long sum of 64-bit hashes overflows
        # under ANSI mode
        return d.agg(F.sum(F.xxhash64("v", "label")
                           .cast("decimal(38,0)"))).first()[0]

    fp_old = None
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.v)
            .groupBy(sym.a).agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "v2")
        )
        new_labels = (
            labels.join(neighbor_min, labels.v == F.col("v2"), "left")
            .select(F.col("v"),
                    F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label")))
                    .alias("label"))
        )
        # localCheckpoint truncates the logical plan — without it each
        # round's plan embeds all previous rounds and planning time grows
        # superlinearly with iterations (bites from ~15 rounds on)
        new_labels = new_labels.localCheckpoint(eager=True)
        # fingerprint-gated fixpoint check (same scheme as the star
        # variant): the exact changed-label join runs only on the round
        # whose label-hash sum matched the previous one
        if fp_old is None:
            fp_old = fingerprint(labels)
        fp_new = fingerprint(new_labels)
        if fp_new == fp_old:
            changed = (
                new_labels.alias("n").join(labels.alias("o"), "v")
                .where(F.col("n.label") != F.col("o.label")).limit(1).count()
            )
            if changed == 0:
                labels = new_labels
                break
        labels, fp_old = new_labels, fp_new
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component"))


def star_contraction_components(edges: DataFrame, src: str = "src",
                                dst: str = "dst",
                                max_iterations: int = 12,
                                driver_finish_edges: int =
                                DRIVER_FINISH_EDGES) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log^2 n) rounds regardless of graph
    diameter, vs O(diameter) for plain min-label propagation.

    This is the variant to run when the near-dup graph has long chains —
    boilerplate/templated web pages form paths and diameters reach
    hundreds, where label propagation would need hundreds of shuffles.

    Each round is two edge rewrites, each one groupBy + one join on the
    vertex id; the edge set only shrinks toward the star form, so shuffle
    volume decays round over round. Convergence is checked with a
    two-sided subtract (an aggregate, never a collect of data).

    Returns (doc_id, component) with component = min vertex id — identical
    output contract to connected_components (equivalence is pytest-checked
    on random graphs).

    Hybrid finish (round 6): edge sets at or below
    ``driver_finish_edges`` — initially, or once contraction has shrunk
    the graph that far — complete with driver-side union-find instead
    of paying more multi-exchange rounds. At web scale the star form
    can stay above any driver bound forever (its size is the clustered
    vertex count), in which case the rounds run to fixpoint exactly as
    before.
    """
    e = (edges.selectExpr(f"{src} AS u", f"{dst} AS v")
         .where(F.col("u") != F.col("v")).distinct())
    vtype = _vertex_type(e)
    if driver_finish_edges:
        # checkpoint before the size probe so the probe's collect and
        # the first contraction round both read materialized blocks
        # instead of re-executing the upstream candidate-pair lineage
        e = e.localCheckpoint(eager=True)
        small = e.limit(driver_finish_edges + 1).collect()
        if len(small) <= driver_finish_edges:
            return _driver_union_find([(r.u, r.v) for r in small],
                                      edges.sparkSession, vtype)

    def sym(d: DataFrame) -> DataFrame:
        return d.unionByName(
            d.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()

    def fingerprint(d: DataFrame) -> tuple:
        row = d.agg(F.count("*").alias("n"),
                    F.sum(F.xxhash64("u", "v")
                          .cast("decimal(38,0)")).alias("h")).first()
        return (row["n"], row["h"])

    fp_old = None
    for _ in range(max_iterations):
        # large-star: every neighbor v > u re-points to m = min(N(u) ∪ {u})
        s = sym(e)
        mins = s.groupBy(F.col("u").alias("c")).agg(F.min("v").alias("mn"))
        m = F.least(F.col("mn"), F.col("c")).alias("m")
        large = (
            s.join(mins, s.u == mins.c)
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .where(F.col("u") != F.col("v")).distinct()
        )
        # small-star: all neighbors v < u (and u itself) re-point to the
        # min of that small neighborhood; large-star left every edge
        # directed child > parent, so d is the whole edge set
        d = large.where(F.col("v") < F.col("u"))
        smins = d.groupBy(F.col("u").alias("c")).agg(F.min("v").alias("mn"))
        joined = d.join(smins, d.u == smins.c)
        small = (
            joined.select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(joined.select("u", F.col("mn").alias("v")))
            .where(F.col("u") != F.col("v")).distinct()
        )
        # localCheckpoint truncates the logical plan — without it each
        # round's plan embeds all previous rounds and Catalyst planning
        # time grows superlinearly with iterations
        new_e = small.localCheckpoint(eager=True)
        # convergence: a cheap order-insensitive fingerprint (count + sum
        # of edge hashes, ONE aggregate job, carried between rounds) gates
        # the exact two-sided subtract, so the expensive check runs only
        # on the round that plausibly converged (round-3 perf)
        if fp_old is None:
            fp_old = fingerprint(e)
        fp_new = fingerprint(new_e)
        if fp_new == fp_old:
            changed = (new_e.subtract(e).limit(1).count()
                       + e.subtract(new_e).limit(1).count())
            if changed == 0:
                e = new_e
                break
        # contraction shrank the graph under the driver bound: finish
        # there instead of paying further multi-exchange rounds (the
        # fingerprint already carries the exact edge count)
        if driver_finish_edges and fp_new[0] <= driver_finish_edges:
            rows = new_e.collect()
            return _driver_union_find([(r.u, r.v) for r in rows],
                                      edges.sparkSession, vtype)
        e, fp_old = new_e, fp_new
    # at the fixpoint edges form stars rooted at the component min
    s = sym(e)
    return (
        s.groupBy("u").agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("doc_id"),
                F.least(F.col("mn"), F.col("u")).alias("component"))
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the MinHash-LSH
    candidate pairs; each doc in a cluster maps to the min doc_id as its
    canonical representative (docs not in any pair are their own cluster
    and omitted here — they're trivially canonical)."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    return connected_components(pairs, "doc_a", "doc_b")


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters via star contraction — same clusters, O(log^2 n)
    rounds instead of O(diameter); the scale path for long-chain graphs."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    return star_contraction_components(pairs, "doc_a", "doc_b")


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
{MINHASH_LSH_PAIRS_SQL.strip()}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.v
)
SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v
"""


# ===========================================================================
# SimHash
# ===========================================================================


def _word_hash_spark() -> Column:
    """First 32 bits of md5(word) as a long (matches DuckDB '0x'::BIGINT)."""
    return F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash: each distinct word votes ±1 per bit position
    of its hash; bit set iff the vote sum is positive.

    Scale: explode(words) + one groupBy(doc_id) with 32 conditional sums —
    all codegen; fingerprint output is 8 bytes/doc.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # narrow formulation: votes are over each doc's OWN distinct words, so
    # the whole fingerprint is per-row array math — zero shuffle (the
    # explode+groupBy alternative shuffles every word for no reason)
    hashes = F.transform(
        F.array_distinct(words_col(F.col("text"))),
        lambda word: F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long"),
    )
    base = (docs.select("doc_id", hashes.alias("h"))
            .where(F.size("h") > 0)
            .withColumn("n", F.size("h")))
    # ONE aggregate pass accumulates all per-bit counts (vote sum =
    # ones - (n - ones) > 0  <=>  2*ones > n); the obvious per-bit
    # size(filter(...)) alternative materializes 32 filtered arrays per
    # row — measured 2.2x slower at sf0.1
    bits = SIMHASH_BITS
    fingerprint = F.expr(
        f"aggregate(zip_with("
        f" aggregate(h, array_repeat(0, {bits}), (acc, x) ->"
        f"  zip_with(acc, transform(sequence(0, {bits - 1}),"
        f"   i -> cast((x >> i) & 1 as int)), (a, b) -> a + b)),"
        f" transform(sequence(0, {bits - 1}),"
        f"  i -> shiftleft(cast(1 as bigint), i)),"
        f" (c, wgt) -> IF(c * 2 > n, wgt, cast(0 as bigint))),"
        f" cast(0 as bigint), (a, b) -> a + b)")
    return base.select("doc_id", fingerprint.alias("simhash"))


SIMHASH_SIGNATURES_SQL = _WORDS_CTE + """,
wordrows AS (
    SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(w) AS word FROM words)
),
hashed AS (
    SELECT doc_id, CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) AS h FROM wordrows
),
votes AS (
    SELECT doc_id,
""" + ",\n".join(
    f"           SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(SIMHASH_BITS)
) + """
    FROM hashed GROUP BY doc_id
)
SELECT doc_id, """ + " + ".join(
    f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
    for b in range(SIMHASH_BITS)
) + """ AS simhash
FROM votes
"""


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: SimHash Hamming distance <= 6, candidate pairs
    generated by matching either 16-bit half (pigeonhole: distance-<=k pairs
    share a half for k < bits/2 buckets... here a recall-oriented heuristic).

    Scale: two bucket joins on 16-bit halves instead of O(n^2) pairs.
    """
    sig = simhash_signatures(spark, sf_dir)
    halves = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(
            F.struct(F.lit(0).alias("part"), F.shiftright("simhash", 16).alias("key")),
            F.struct(F.lit(1).alias("part"), F.col("simhash").bitwiseAND(F.lit(65535)).alias("key")),
        )).alias("h"),
    ).select("doc_id", "simhash", "h.part", "h.key")
    a, b = halves.alias("a"), halves.alias("b")
    return (
        a.join(b, ["part", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= 6)
    )


def _simhash_pairs_sql() -> str:
    # nested WITH inside a parenthesized subquery is valid DuckDB SQL
    sig_body = SIMHASH_SIGNATURES_SQL.strip()
    return f"""
WITH sig AS (
{sig_body}
),
halves AS (
    SELECT doc_id, simhash, 0 AS part, simhash >> 16 AS key FROM sig
    UNION ALL
    SELECT doc_id, simhash, 1 AS part, simhash & 65535 AS key FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM halves a JOIN halves b USING (part, key)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 6
"""


SIMHASH_NEAR_PAIRS_SQL = _simhash_pairs_sql()


# ===========================================================================
# n-gram Jaccard (blocked pairwise)
# ===========================================================================


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.08) -> DataFrame:
    """Pairwise word-bigram Jaccard within (lang, source) blocks.

    Scale: blocking bounds the pair count (never all-pairs); the arrays ride
    along the block join. Jaccard = |∩| / |∪| over distinct bigrams — an
    exact integer ratio, so the double compares identically cross-engine.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = F.col("w")
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(wc) - 1),
        lambda i: F.array_join(F.slice(wc, i, 2), " "),
    ))
    # the >= 2 guard must precede the sequence: sequence(1, 0) is the
    # DESCENDING [1, 0], and slice(w, 0, _) throws on single-word docs
    base = (docs.select("doc_id", "lang", "source",
                        words_col(F.col("text")).alias("w"))
            .where(F.size("w") >= 2)
            .select("doc_id", "lang", "source", bigrams.alias("grams")))
    a, b = base.alias("a"), base.alias("b")
    # compute the intersection ONCE per pair; jaccard derives from it
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    paired = (
        a.join(b, ["lang", "source"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            "lang", "source",
            inter.alias("__i"),
            (F.size(F.col("a.grams")) + F.size(F.col("b.grams"))).alias("__ab"),
        )
    )
    jac = F.col("__i").cast("double") / (F.col("__ab") - F.col("__i")).cast("double")
    return (
        paired.select("doc_a", "doc_b", "lang", "source", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


NGRAM_JACCARD_PAIRS_SQL = _WORDS_CTE + """,
grams AS (
    SELECT doc_id, lang, source,
           list_distinct(list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i+1])) AS g
    FROM (SELECT doc_id, lang, source, {words} AS w FROM documents)
    WHERE len(w) >= 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang, a.source AS source,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
FROM grams a JOIN grams b ON a.lang = b.lang AND a.source = b.source
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.08
""".replace("{words}", _WORDS_SQL)


# ===========================================================================
# embedding cosine near-dup
# ===========================================================================


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str,
                             threshold: float = 0.25) -> DataFrame:
    """Near-duplicate vectors: cosine >= threshold within label buckets.

    Scale: bucketing by a coarse key (here ``label``, i.e. an IVF-style
    cluster assignment) turns O(n²) into O(sum of bucket²) — the standard
    embedding-dedup shape. The fold arithmetic is bit-identical to the
    oracle (functions/vector.py).
    """
    from ru_cdc_spark.functions.vector import as_double_array, dot, norm

    e = as_double_array(F.col("embedding"))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", e.alias("e"), norm(e).alias("nrm"))
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, ["label"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
                "label", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.label = b.label
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.25
"""


def band_index_store(index_dir: str):
    """The dedup MinHash BAND index as a persisted, manifest-committed
    postings store (r12) — the same shared machinery as the ANN
    L-tables index (operators/postings_store.py): hive-partitioned by
    ``band_idx`` (directory count stays N_BANDS as the corpus grows),
    files sorted by (band_idx, band_hash, doc_id) so hash-equality
    probes prune via parquet min/max string stats, manifest-pinned
    reads, append-only maintenance, atomic compaction commits, explicit
    vacuum, checkpointed replay."""
    from ru_cdc_spark.operators.postings_store import PostingsStore
    # n_partitions=N_BANDS is a staging-shuffle sizing hint only (see
    # PostingsStore) — the band count is the partition-value count
    return PostingsStore(index_dir, "band_idx",
                         ("band_idx", "band_hash", "doc_id"),
                         n_partitions=N_BANDS)


def band_index_build(bands: DataFrame, index_dir: str,
                     n_bands: int | None = None,
                     rows_per_band: int | None = None) -> None:
    """Materialize the corpus's (band_idx, band_hash, doc_id) postings
    as the persisted dedup index; commits manifest version 0 with the
    banding configuration — maintenance and admission read it back
    (``band_index_banding``) and refuse frames banded any other way,
    mirroring how the ANN store pins (L, k) at build
    (similarity.py lsh_index_build)."""
    band_index_store(index_dir).build(
        bands.select("band_idx", "band_hash", "doc_id"),
        meta={"n_bands": N_BANDS if n_bands is None else int(n_bands),
              "rows_per_band": (2 if rows_per_band is None
                                else int(rows_per_band))})


def band_index_banding(index_dir: str) -> tuple[int, int]:
    """(n_bands, rows_per_band) the index was BUILT with — read from
    the manifest build commit, never session constants, so session
    drift (a retuned N_BANDS, a corpus-adaptive choice) cannot split
    the coding between index and probe."""
    meta = band_index_store(index_dir).meta()
    try:
        return int(meta["n_bands"]), int(meta["rows_per_band"])
    except KeyError as exc:
        raise RuntimeError(
            f"{index_dir}: build commit metadata lacks banding config "
            f"({meta!r}) — rebuild the index") from exc


def _require_banding(index_dir: str,
                     banded_with: tuple[int, int]) -> None:
    """Fail loudly when a pre-banded frame's configuration differs
    from the one the index was built with: probing 2-band hashes
    against a 4-band index silently admits near-everything."""
    built = band_index_banding(index_dir)
    if built != tuple(banded_with):
        raise RuntimeError(
            f"{index_dir}: frame banded with (n_bands, rows_per_band)="
            f"{tuple(banded_with)} but the index was built with "
            f"{built} — band with band_index_banding(index_dir) "
            "(band_table_of(docs, *banding))")


def band_index_append(bands: DataFrame, index_dir: str,
                      banded_with: tuple[int, int] | None = None) -> None:
    """Admit accepted documents' bands into the persisted index — one
    new sorted file per band partition, one manifest commit; cost
    scales with the batch, never the corpus (the ANN append contract,
    shared store). ``banded_with`` declares how ``bands`` was banded
    (defaults to the session constants); it is checked against the
    build commit's banding and mismatches refuse loudly."""
    _require_banding(index_dir, banded_with or (N_BANDS, 2))
    band_index_store(index_dir).append(
        bands.select("band_idx", "band_hash", "doc_id"))


def band_index_admit(spark: SparkSession, new_bands: DataFrame,
                     index_dir: str,
                     banded_with: tuple[int, int] | None = None) -> DataFrame:
    """Admission decision for a NEW batch against the PERSISTED index:
    a document is admitted iff none of its band hashes collides with
    the accumulated corpus. The index side is a manifest-pinned scan —
    a batch admitting concurrently with maintenance sees one committed
    snapshot, never a torn one.

    Scale: the join is batch-bands x index equi-join on
    (band_idx, band_hash) — shuffle proportional to the BATCH; the
    index partitions are band_idx-pruned at the directory level and
    band_hash-pruned by row-group stats (files are hash-sorted). No
    pairwise work: admission is a semi-join decision.

    ``banded_with`` declares the (n_bands, rows_per_band) that banded
    ``new_bands`` (defaults to the session constants) and is verified
    against the build commit's banding — a mismatch refuses loudly
    instead of silently probing with a different coding."""
    _require_banding(index_dir, banded_with or (N_BANDS, 2))
    postings = band_index_store(index_dir).postings(spark)
    colliding = (new_bands
                 .join(postings.select("band_idx", "band_hash"),
                       ["band_idx", "band_hash"], "left_semi")
                 .select("doc_id").distinct())
    all_new = new_bands.select("doc_id").distinct()
    # ONE left join replaces the previous anti-join + union pair
    # (r13): colliding ⊆ all_new, so flagging membership partitions
    # the batch identically while evaluating the colliding subtree
    # once instead of twice
    return (
        all_new.join(colliding.withColumn("c", F.lit(1)), "doc_id", "left")
        .select("doc_id", F.col("c").isNull().alias("admitted"))
    )


def dedup_index_admission(spark: SparkSession, sf_dir: str,
                          index_dir: str) -> DataFrame:
    """End-to-end persisted-index dedup admission (r12): build the band
    index from the accumulated corpus (doc_id % 10 != 0), then decide
    the arriving batch (doc_id % 10 == 0) against it via the
    manifest-pinned semi-join. Semantically identical to
    :func:`dedup_incremental_new_batch` (same split, same banding), so
    it hash-gates against the SAME DuckDB oracle — the driver proves
    persisted-index admission == derived-index admission every round.
    The append/compact/vacuum lifecycle on this index is pytest-gated
    (test_band_index_lifecycle_shares_store)."""
    # persist the shared MinHash derivation across the build's staging
    # write and the admission probe (r13; r14 re-settled the cached
    # stage with the Arrow kernel in place — see _shared_band_table)
    bands = _shared_band_table(spark, sf_dir)
    band_index_build(bands.where(F.col("doc_id") % 10 != 0), index_dir)
    return band_index_admit(
        spark, bands.where(F.col("doc_id") % 10 == 0), index_dir)


def band_stream_ingest_batch(spark: SparkSession, batch_docs: DataFrame,
                             index_dir: str, verdict_dir: str,
                             batch_id: int,
                             compact_every: int = 2) -> None:
    """One streaming-admission micro-batch, safe under Structured
    Streaming's AT-LEAST-ONCE foreachBatch retries.

    The decision is EXACTLY-ONCE: batch N's verdicts are computed at
    most once — a retry reuses the completed ``batch-N`` verdict file
    (``_SUCCESS``-marked) instead of recomputing, because a recompute
    AFTER the batch's own admitted bands were appended would see the
    batch colliding with ITSELF and flip admitted -> rejected (the r12
    review finding: deterministic overwrite alone only covered the
    crash-before-append window). Order matters: decide + persist
    verdicts FIRST, append second — a crash mid-verdict-write implies
    the append never ran (safe to recompute); a crash after the append
    finds the completed verdicts and only re-appends, and duplicate
    posting rows cannot change any future semi-join verdict."""
    import os

    # ADOPT the build's banding (never session constants): a session
    # whose N_BANDS drifted from the build must still probe and append
    # with the index's own coding — the ANN pattern (serving reads the
    # build commit's (L, k), similarity.py:1497)
    banding = band_index_banding(index_dir)
    bands = band_table_of(batch_docs, *banding)
    bdir = os.path.join(verdict_dir, f"batch-{batch_id}")
    if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
        (band_index_admit(spark, bands, index_dir, banded_with=banding)
         .write.mode("overwrite").parquet(bdir))
    admitted = (spark.read.parquet(bdir)   # batch-sized, just written
                .where(F.col("admitted")).select("doc_id"))
    band_index_append(bands.join(admitted, "doc_id", "left_semi"),
                      index_dir, banded_with=banding)
    if (batch_id + 1) % compact_every == 0:
        band_index_store(index_dir).compact(spark)
        # retain one pre-compaction version: a reader pinned just
        # before the compact commit (admission serving beside the
        # stream) must still find its files — retain_versions=0 would
        # delete under that pin (r12 verdict #6)
        band_index_store(index_dir).vacuum(retain_versions=1)


def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: admit a NEW batch of documents only if no LSH
    band collides with the EXISTING corpus index — the continuous
    -ingestion shape (every production training-data pipeline dedups
    arriving batches against an accumulated index, never corpus x corpus).

    Here the split is derived (doc_id % 10 == 0 is "new"); in production
    the index's (band_idx, band_hash) table is a persisted, clustered
    table that each arriving batch left-anti joins.

    Scale: the join is new-batch-sized x index equi-join on the band key
    — shuffle proportional to the BATCH, not the corpus; the index side
    is pre-partitioned by band key so only matching partitions read. No
    pairwise work at all (contrast minhash_lsh_pairs): admission is a
    semi-join decision, not pair enumeration.
    """
    # shared persisted derivation (r14): the new/index/all_new branches
    # otherwise re-run the MinHash pipeline once per reference
    bands = _shared_band_table(spark, sf_dir)
    new = bands.where(F.col("doc_id") % 10 == 0)
    index = bands.where(F.col("doc_id") % 10 != 0) \
                 .select("band_idx", "band_hash").distinct()
    colliding = (
        new.join(index, ["band_idx", "band_hash"], "left_semi")
        .select("doc_id").distinct()
    )
    all_new = new.select("doc_id").distinct()
    return (
        all_new.join(colliding, "doc_id", "left_anti")
        .select("doc_id", F.lit(True).alias("admitted"))
        .unionByName(colliding.select("doc_id", F.lit(False).alias("admitted")))
    )


DEDUP_INCREMENTAL_SQL = MINHASH_LSH_PAIRS_SQL.rsplit("SELECT DISTINCT", 1)[0] + """,
new_bands AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
idx AS (SELECT DISTINCT band_idx, band_hash FROM bands WHERE doc_id % 10 <> 0),
colliding AS (
    SELECT DISTINCT doc_id FROM new_bands
    WHERE (band_idx, band_hash) IN (SELECT (band_idx, band_hash) FROM idx)
)
SELECT doc_id, TRUE AS admitted FROM (
    SELECT DISTINCT doc_id FROM new_bands
    EXCEPT SELECT doc_id FROM colliding
)
UNION ALL
SELECT doc_id, FALSE AS admitted FROM colliding
"""


def _seq_admission_sql() -> str:
    """DuckDB oracle for SEQUENTIAL (online) dedup admission: base
    index = odd doc_ids; three arriving batches (doc_id % 6 = 0, 2, 4)
    decided IN ORDER, each admitted batch's bands joining the index
    before the next batch is judged. A fixed batch count makes the
    online semantics exactly SQL-expressible as a chained CTE — i0 ->
    (n0, r0, a0, i1) -> ... — so the driver hash-gates the engine's
    actual micro-batch replay, order included."""
    parts = [MINHASH_LSH_PAIRS_SQL.rsplit("SELECT DISTINCT", 1)[0]]
    parts.append(""",
i0 AS (SELECT DISTINCT band_idx, band_hash FROM bands
       WHERE doc_id % 2 <> 0)""")
    for step, s in enumerate(STREAM_ADMISSION_SLICES):
        parts.append(f""",
n{step} AS (SELECT * FROM bands WHERE doc_id % 6 = {s}),
r{step} AS (SELECT DISTINCT doc_id FROM n{step}
      WHERE (band_idx, band_hash)
            IN (SELECT (band_idx, band_hash) FROM i{step})),
a{step} AS (SELECT DISTINCT doc_id FROM n{step}
      EXCEPT SELECT doc_id FROM r{step}),
i{step + 1} AS (SELECT band_idx, band_hash FROM i{step}
      UNION SELECT band_idx, band_hash FROM n{step}
      WHERE doc_id IN (SELECT doc_id FROM a{step}))""")
    n = len(STREAM_ADMISSION_SLICES)
    admitted = " UNION ALL ".join(
        f"SELECT doc_id FROM a{i}" for i in range(n))
    rejected = " UNION ALL ".join(
        f"SELECT doc_id FROM r{i}" for i in range(n))
    parts.append(f"""
SELECT doc_id, TRUE AS admitted FROM ({admitted})
UNION ALL
SELECT doc_id, FALSE AS admitted FROM ({rejected})""")
    return "".join(parts)


# arriving-batch order for the streaming admission entry: doc_id % 6
# values, judged strictly in this order (the % 2 == 0 half of the
# corpus; the % 2 != 0 half is the pre-built index). Chosen so the
# sequential verdicts genuinely DIVERGE from all-at-once batch
# admission on the fixture (6 verdicts differ at sf0.001, 5 at sf0.01
# — checked against an independent Python replay; a narrower new-set
# had zero divergence, the r11 vacuousness trap).
STREAM_ADMISSION_SLICES = (0, 2, 4)

DEDUP_STREAM_ADMISSION_SQL = _seq_admission_sql()


def corpus_dedup_retain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-duplicate removal: MinHash-LSH candidate pairs ->
    connected components -> keep the minimum doc_id of every cluster as
    its canonical survivor; documents that appear in no candidate pair
    survive untouched as singleton clusters.

    This is the composition a training-data pipeline actually runs (pairs
    and clusters are intermediates); output is the retained corpus with
    per-survivor cluster size for audit.

    Scale: components run over the candidate-pair graph only (tiny vs the
    corpus); the final survivors-vs-corpus reconciliation is one left-anti
    join keyed by doc_id. The build side (clustered doc ids) is NOT
    broadcast-hinted: at web scale 30-50% of documents land in some
    cluster — billions of ids, far past any broadcast limit — so the
    join strategy is left to AQE, which broadcasts when the measured
    size allows and shuffles on the already-hashed doc_id otherwise.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = connected_components(
        minhash_lsh_pairs(spark, sf_dir), "doc_a", "doc_b")
    clusters = (
        comp.groupBy("component")
        .agg(F.count("*").alias("cluster_size"))
        .select(F.col("component").alias("doc_id"), "cluster_size")
    )
    loners = (
        docs.join(comp.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit(1).cast("long").alias("cluster_size"))
    )
    return clusters.unionByName(loners)


CORPUS_DEDUP_RETAIN_SQL = f"""
WITH RECURSIVE pairs AS (
{MINHASH_LSH_PAIRS_SQL.strip()}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v)
SELECT component AS doc_id, COUNT(*) AS cluster_size FROM comp GROUP BY component
UNION ALL
SELECT d.doc_id, 1 AS cluster_size FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
"""


def dedup_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning curve for near-dup detection: histogram of pairwise
    word-bigram Jaccard similarities within (lang, source) blocks, in 0.05
    buckets — how many pairs a given dedup threshold would merge.

    Oracle determinism: the bucket is (20 * |inter|) DIV |union| in pure
    integer math — floor(20 * jaccard) without ever computing a float, so
    bucket edges cannot flip on rounding.

    Scale: same blocked pairing as ngram_jaccard_pairs (never all-pairs);
    the histogram collapses pairs to at most 21 rows via map-side combine.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = F.col("w")
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(wc) - 1),
        lambda i: F.array_join(F.slice(wc, i, 2), " "),
    ))
    base = (docs.select("doc_id", "lang", "source",
                        words_col(F.col("text")).alias("w"))
            .where(F.size("w") >= 2)
            .select("doc_id", "lang", "source", bigrams.alias("grams")))
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    paired = (
        a.join(b, ["lang", "source"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            inter.alias("i"),
            (F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter)
            .alias("u"),
        )
    )
    bucket = F.least(F.expr("(20 * i) DIV u"), F.lit(19)).cast("int")
    return (
        paired.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_pairs"))
        .withColumn("jaccard_lo",
                    F.round(F.col("bucket") * F.lit(0.05), 2))
    )


DEDUP_THRESHOLD_CALIBRATION_SQL = _WORDS_CTE + """,
grams AS (
    SELECT doc_id, lang, source,
           list_distinct(list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i+1])) AS g
    FROM (SELECT doc_id, lang, source, {words} AS w FROM documents)
    WHERE len(w) >= 2
),
pairs AS (
    SELECT len(list_intersect(a.g, b.g)) AS i,
           len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS u
    FROM grams a JOIN grams b ON a.lang = b.lang AND a.source = b.source
    WHERE a.doc_id < b.doc_id
)
SELECT bucket, n_pairs,
       ROUND(CAST(bucket AS DOUBLE) * 0.05, 2) AS jaccard_lo
FROM (
    SELECT CAST(LEAST((20 * i) // u, 19) AS INT) AS bucket,
           COUNT(*) AS n_pairs
    FROM pairs GROUP BY 1
)
""".replace("{words}", _WORDS_SQL)


# ===========================================================================
# fuzzy key join (edit distance <= 1) via FastSS deletion neighborhoods
# ===========================================================================

FUZZY_MAX_KEY = 1000


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str,
                     max_key: int = FUZZY_MAX_KEY) -> DataFrame:
    """Typo-tolerant self-join: all pairs of customer names at edit
    distance exactly 1, found WITHOUT the quadratic comparison — the
    FastSS blocking: each name's candidate keys are the name itself plus
    every single-character deletion; two strings within edit distance 1
    always share a key, so the equi-join on the deletion key yields a
    complete candidate set, and the exact ``levenshtein`` filter keeps
    only true pairs (blocking guarantees no false negatives; the verify
    step removes the distance-2 false candidates deletions can admit).

    Scale: candidates = one explode (length+1 keys/row) + one equi-join
    shuffle on the key — O(n·L) work versus the O(n²) cross join the
    oracle runs at test scale. Key-frequency skew (a common surname) is
    the hazard: cap or salt hot blocks like the LSH band join
    (minhash_lsh_pairs_capped)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < max_key)
        .select("c_custkey", "c_name")
    )
    neighborhood = F.array_union(
        F.array(F.col("c_name")),
        F.transform(
            F.sequence(F.lit(1), F.length("c_name")),
            lambda i: F.concat(
                F.substring(F.col("c_name"), F.lit(1), i - 1),
                F.col("c_name").substr(i + 1, F.length("c_name")),
            ),
        ),
    )
    keyed = cust.select(
        "c_custkey", "c_name", F.explode(neighborhood).alias("bkey"))
    a, b = keyed.alias("a"), keyed.alias("b")
    candidates = (
        a.join(b, "bkey")
        .where(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(F.col("a.c_custkey").alias("k1"),
                F.col("b.c_custkey").alias("k2"),
                F.col("a.c_name").alias("n1"),
                F.col("b.c_name").alias("n2"))
        .distinct()
    )
    return candidates.where(F.levenshtein("n1", "n2") == 1)


FUZZY_NAME_PAIRS_SQL = f"""
SELECT a.c_custkey AS k1, b.c_custkey AS k2,
       a.c_name AS n1, b.c_name AS n2
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE a.c_custkey < {FUZZY_MAX_KEY} AND b.c_custkey < {FUZZY_MAX_KEY}
  AND levenshtein(a.c_name, b.c_name) = 1
"""


def doc_containment_pairs(spark: SparkSession, sf_dir: str,
                          threshold: float = 0.10) -> DataFrame:
    """DIRECTED containment C(A in B) = |grams(A) ∩ grams(B)| / |grams(A)|
    within (lang, source) blocks — the asymmetric overlap measure that
    catches a short document quoted/embedded inside a long one, which
    symmetric Jaccard dilutes toward zero (|∪| is dominated by the long
    side). Broder's containment companion to the resemblance (Jaccard)
    from the original shingling paper; the standard boilerplate/quote
    detector in corpus curation.

    Scale: same blocked self-join shape as ngram_jaccard_pairs (pair
    count bounded by blocks, grams ride the join, intersection computed
    once per ordered pair); containment is an exact integer ratio —
    engine-identical double.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = F.col("w")
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(wc) - 1),
        lambda i: F.array_join(F.slice(wc, i, 2), " "),
    ))
    base = (docs.select("doc_id", "lang", "source",
                        words_col(F.col("text")).alias("w"))
            .where(F.size("w") >= 2)
            .select("doc_id", "lang", "source", bigrams.alias("grams")))
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    paired = (
        a.join(b, ["lang", "source"])
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_common"),
            F.size(F.col("a.grams")).alias("n_a"),
        )
    )
    containment = F.col("n_common").cast("double") / F.col("n_a").cast("double")
    return (paired.select("doc_a", "doc_b", "n_common", "n_a",
                          containment.alias("containment"))
            .where(F.col("containment") >= threshold))


DOC_CONTAINMENT_SQL = """
WITH grams AS (
    SELECT doc_id, lang, source,
           list_distinct(list_transform(range(1, len(w)),
                         i -> w[i] || ' ' || w[i+1])) AS g
    FROM (SELECT doc_id, lang, source, {words} AS w FROM documents)
    WHERE len(w) >= 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.g, b.g)) AS n_common,
       len(a.g) AS n_a,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g)
           AS containment
FROM grams a JOIN grams b ON a.lang = b.lang AND a.source = b.source
WHERE a.doc_id <> b.doc_id
  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) >= 0.10
""".replace("{words}", _WORDS_SQL)


def ml_minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                         jaccard_max_dist: float = 0.6) -> DataFrame:
    """Near-dup pairs via the MLlib estimator path (ml.feature.MinHashLSH
    + approxSimilarityJoin) — the library counterpart to the hand-rolled
    Carter-Wegman MinHash (`minhash_lsh_pairs`), kept alongside it
    because the estimator owns its hash family (random coefficients from
    a seed) and its join internals, which is exactly what you want when
    you'd rather configure than maintain.

    Rows-only correctness (the estimator's hash family is seeded RNG, not
    SQL-reproducible); planted-duplicate recall and the Jaccard-distance
    contract are pytest-gated against the exact pairwise computation.

    Scale: same banding theory as the manual path — approxSimilarityJoin
    explodes per-band hash buckets and joins on them, so cost tracks
    bucket occupancy, not the pair square. The estimator's vocab-sized
    binary vectors ride sparsely (HashingTF over shingles).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = spread(load_table(spark, sf_dir, "documents")) \
        .select("doc_id", words_col(F.col("text")).alias("w")) \
        .where(F.size("w") >= 3)
    shingled = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 2),
            lambda i: F.array_join(F.slice("w", i, 3), " "),
        ).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=8, seed=17)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_max_dist,
                                        distCol="jaccard_dist")
    return (joined
            .select(F.col("datasetA.doc_id").alias("doc_a"),
                    F.col("datasetB.doc_id").alias("doc_b"),
                    F.col("jaccard_dist"))
            .where(F.col("doc_a") < F.col("doc_b")))
