"""Generate golden DuckDB oracles for ``multimodal_phash_near_dup`` and
``multimodal_phash_clusters``.

The pHash pipeline over the fixture corpus is fully deterministic (the
payload-derived pseudo-pixels are an md5 formula; the DCT, median
threshold, banding, Hamming check, and component contraction are all
exact), so — same pattern as the BPE/k-core goldens — the expected rows
are freezable as corpus-signature-keyed literal tables.

Independence: this generator recomputes everything single-node with
DIFFERENT algorithms where one exists — the DCT by direct nested
cosine summation in pure Python (the engine uses an orthonormal basis
matrix through numpy BLAS matmuls), the median as the middle order
statistic by explicit sort, and the clusters by union-find (the engine
runs distributed star contraction). The pixel formula and the banding
rule are the fixture/operator SPEC, so those are shared by necessity.

Usage: python tools/gen_phash_oracle.py   (rewrites
       ru_cdc_spark/operators/phash_golden_sql.py)
"""

from __future__ import annotations

import hashlib
import math
import os
from collections import defaultdict

import duckdb

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ru_cdc_spark", "operators", "phash_golden_sql.py")
N = 32        # pixel grid (multimodal._PH_N)
K = 8         # kept DCT block (multimodal._PH_K)
BANDS = 4     # multimodal.PHASH_BANDS
HAMMING_MAX = 8  # multimodal.PHASH_HAMMING_MAX

SIG_SQL = ("SELECT md5(string_agg(md5(text), ',' ORDER BY doc_id)) "
           "FROM documents")


def fake_pixels(payload: bytes, noise_step: int) -> list[list[float]]:
    raw = b"".join(
        hashlib.md5(payload + i.to_bytes(2, "little")).digest()
        for i in range(N * N // 16))
    px = [[float(raw[r * N + c]) for c in range(N)] for r in range(N)]
    for j in range(noise_step):
        px[(j * 7) % N][(j * 13) % N] += 1.0
    return px


def naive_phash(px: list[list[float]]) -> int:
    """Direct nested-sum orthonormal DCT-II (no basis matrix, no BLAS),
    median by explicit order statistic."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    scale = math.sqrt(2.0 / N)
    coef = []
    for u in range(K):
        for v in range(K):
            s = 0.0
            for x in range(N):
                cu = scale * math.cos(math.pi * (2 * x + 1) * u / (2 * N))
                if u == 0:
                    cu *= inv_sqrt2
                row = px[x]
                inner = 0.0
                for y in range(N):
                    cv = scale * math.cos(
                        math.pi * (2 * y + 1) * v / (2 * N))
                    if v == 0:
                        cv *= inv_sqrt2
                    inner += row[y] * cv
                s += cu * inner
            coef.append(s)
    ac = sorted(coef[1:])
    med = ac[len(ac) // 2]  # 63 values: the exact middle statistic
    bits = 0
    for idx, v in enumerate(coef):
        if v > med:
            bits |= 1 << idx
    return bits


def golden_for(sf_dir: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    sig = con.execute(SIG_SQL).fetchone()[0]
    docs = dict(con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 200"
        " ORDER BY doc_id").fetchall())

    hashes: dict[int, int] = {}
    for doc_id in docs:
        leader = doc_id - doc_id % 5
        payload = docs[leader].encode("utf-8")
        hashes[doc_id] = naive_phash(fake_pixels(payload, doc_id % 5))

    # banding candidates + exact Hamming, then brute union-find
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for d, h in hashes.items():
        for b in range(BANDS):
            buckets[(b, (h >> (16 * b)) & 0xFFFF)].append(d)
    pairs: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for bdoc in members[i + 1:]:
                key = (a, bdoc)
                if key in pairs:
                    continue
                ham = bin(hashes[a] ^ hashes[bdoc]).count("1")
                if ham <= HAMMING_MAX:
                    pairs[key] = ham
    if not pairs:
        raise SystemExit(f"{sf_dir}: zero near-dup pairs — vacuous golden")

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, bdoc in pairs:
        ra, rb = find(a), find(bdoc)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = defaultdict(list)
    for v in parent:
        comps[find(v)].append(v)
    clusters = sorted(
        (min(ms), len(ms), ",".join(str(i) for i in sorted(ms)))
        for ms in comps.values())
    # non-vacuousness: clustering must actually merge beyond pairs
    if all(n <= 2 for _, n, _ in clusters):
        raise SystemExit(f"{sf_dir}: no cluster larger than a pair — "
                         "the contraction golden would be vacuous")
    pair_rows = sorted((a, bdoc, h) for (a, bdoc), h in pairs.items())
    return sig, pair_rows, clusters


def main() -> None:
    blocks = [golden_for(d) + (d,) for d in SF_DIRS]
    for sig, pair_rows, clusters, d in blocks:
        print(f"{d}: sig={sig} pairs={len(pair_rows)} "
              f"clusters={len(clusters)} "
              f"ham_sum={sum(h for _, _, h in pair_rows)}")

    def keyed_union(cte_rows: list[str], sigs: list[str],
                    cols: str, casts: str) -> str:
        parts = [f"WITH sig AS (\n    {SIG_SQL.replace('FROM documents', '')}"
                 "AS h FROM documents\n)"]
        selects = []
        for i, (rows, s) in enumerate(zip(cte_rows, sigs), start=1):
            parts.append(f",\ng{i}({cols}) AS (\n    VALUES {rows}\n)")
            selects.append(f"SELECT {casts}\n"
                           f"FROM g{i} WHERE (SELECT h FROM sig) = '{s}'")
        return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)

    sigs = [b[0] for b in blocks]
    near_sql = keyed_union(
        [",".join(f"({a},{b},{h})" for a, b, h in blk[1]) for blk in blocks],
        sigs,
        "doc_a, doc_b, hamming",
        "CAST(doc_a AS BIGINT) AS doc_a,\n"
        "       CAST(doc_b AS BIGINT) AS doc_b,\n"
        "       CAST(hamming AS INT) AS hamming")
    clus_sql = keyed_union(
        [",".join(f"({r},{n},'{m}')" for r, n, m in blk[2])
         for blk in blocks],
        sigs,
        "cluster_rep, n_members, members",
        "CAST(cluster_rep AS BIGINT) AS cluster_rep,\n"
        "       CAST(n_members AS BIGINT) AS n_members,\n"
        "       members")

    header = (
        '"""GENERATED by tools/gen_phash_oracle.py — do not edit by hand.\n'
        "\n"
        "Golden DuckDB oracles for the pHash near-dup pair and cluster\n"
        "queries, frozen from an independent single-node pipeline (direct\n"
        "nested-sum DCT, order-statistic median, union-find components —\n"
        "see the generator docstring), keyed by the documents corpus\n"
        "signature; zero rows (loud failure) on any other corpus.\n"
        '"""\n\n'
    )
    with open(OUT, "w") as f:
        f.write(header)
        f.write("PHASH_NEAR_DUP_SQL = r'''\n" + near_sql + "\n'''\n\n")
        f.write("PHASH_CLUSTERS_SQL = r'''\n" + clus_sql + "\n'''\n")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
