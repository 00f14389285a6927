"""Generate the DuckDB golden oracle for ``text_bpe_token_counts``.

BPE encoding is not SQL-expressible, so the driver gate historically
graded this query rows-only. But the whole pipeline is deterministic
(frequency ties break lexicographically, tests/test_bpe.py), so the
expected per-document token counts CAN be frozen as golden values and
compared by the driver's hash gate like any other query.

Independence: the goldens here are computed with the *naive merge-replay
encoder* (apply each merge in training order, replace-all — the same
independent formulation tests/test_bpe.py uses for its differential
check), NOT the engine's lowest-rank-first search, and the word counting
is single-node pure Python, not the Spark shuffle. A regression in
either the distributed word-frequency pass, the Arrow encode path, or
the training loop breaks the hash gate.

The oracle SQL embeds one literal table per known corpus (sf0.001 and
sf0.01 differ) and selects the right one via a corpus signature DuckDB
computes itself — md5 of the doc-ordered md5(text) concatenation — so a
single static SQL string grades correctly at either scale factor and
returns ZERO rows (an honest, loud failure) on an unknown corpus.

Usage: python tools/gen_bpe_oracle.py   (rewrites
       ru_cdc_spark/operators/bpe_golden_sql.py)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ru_cdc_spark.operators.bpe import EOW, train_merges  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ru_cdc_spark", "operators", "bpe_golden_sql.py")
# must match queries.text_bpe_token_counts — and stay SMALL enough that
# the fixture vocabulary does NOT collapse to one token per word, else
# bpe_tokens == ws_tokens everywhere and the golden is vacuous (the
# generator asserts this below)
N_MERGES = 40
MAX_WORDS = 50_000


def naive_encode_len(word: str, merges: list[tuple[int, int, int]]) -> int:
    """Independent encoder: replay merges in TRAINING order, replacing
    all occurrences (tests/test_bpe.py::_naive_encode formulation)."""
    sym = list(word.encode("utf-8")) + [EOW]
    for left, right, new_id in merges:
        out = []
        i = 0
        n = len(sym)
        while i < n:
            if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                out.append(new_id)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def golden_for(sf_dir: str) -> tuple[str, list[tuple[int, int, int]]]:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    sig = con.execute(
        "SELECT md5(string_agg(md5(text), ',' ORDER BY doc_id)) "
        "FROM documents").fetchone()[0]
    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()

    # this single-node pass tokenizes with Python str.split()/.lower();
    # the engine uses Java regex \s+ / F.lower. Identical on ASCII, but
    # Python splits on Unicode whitespace (U+00A0, U+2028, ...) where
    # Java \s+ does not — so refuse to freeze goldens for a corpus
    # where the two tokenizations could diverge
    for _, text in docs:
        if any(ord(ch) > 127 for ch in text):
            raise SystemExit(
                f"{sf_dir}: non-ASCII text in documents — the generator's "
                "str.split() tokenization is only provably identical to "
                "the engine's Java-regex \\s+ split on ASCII; teach both "
                "sides the same Unicode rules before regenerating")

    wc: Counter = Counter()
    for _, text in docs:
        wc.update(text.lower().split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORDS]
    merges = train_merges(top, N_MERGES)

    memo: dict[str, int] = {}
    rows: list[tuple[int, int, int]] = []
    for doc_id, text in docs:
        ws = text.split()
        total = 0
        for w in (x.lower() for x in ws):
            n = memo.get(w)
            if n is None:
                n = memo[w] = naive_encode_len(w, merges)
            total += n
        rows.append((int(doc_id), total, len(ws)))

    # non-vacuousness: if BPE collapsed every word to one token, the
    # golden degenerates to whitespace counting and pins nothing about
    # the merge loop or the encoder — lower N_MERGES instead
    differing = sum(1 for _, b, w in rows if b != w)
    if differing < len(rows) // 2:
        raise SystemExit(
            f"{sf_dir}: only {differing}/{len(rows)} golden rows have "
            "bpe_tokens != ws_tokens — the oracle would be (nearly) "
            "vacuous for BPE regressions; lower N_MERGES")
    return sig, rows


def values_block(rows: list[tuple[int, int, int]]) -> str:
    tuples = ",".join(f"({d},{b},{w})" for d, b, w in rows)
    return tuples


def main() -> None:
    blocks = []
    for i, sf_dir in enumerate(SF_DIRS, start=1):
        sig, rows = golden_for(sf_dir)
        print(f"{sf_dir}: sig={sig} docs={len(rows)} "
              f"total_bpe={sum(r[1] for r in rows)}")
        blocks.append((sig, rows, sf_dir))

    parts = ["WITH sig AS (\n"
             "    SELECT md5(string_agg(md5(text), ',' ORDER BY doc_id)) AS h\n"
             "    FROM documents\n)"]
    selects = []
    for i, (sig, rows, sf_dir) in enumerate(blocks, start=1):
        parts.append(f",\ng{i}(doc_id, bpe_tokens, ws_tokens) AS (  "
                     f"-- {os.path.basename(sf_dir)}\n"
                     f"    VALUES {values_block(rows)}\n)")
        selects.append(
            f"SELECT CAST(doc_id AS BIGINT) AS doc_id,\n"
            f"       CAST(bpe_tokens AS BIGINT) AS bpe_tokens,\n"
            f"       CAST(ws_tokens AS BIGINT) AS ws_tokens\n"
            f"FROM g{i} WHERE (SELECT h FROM sig) = '{sig}'")
    sql = "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)

    header = (
        '"""GENERATED by tools/gen_bpe_oracle.py — do not edit by hand.\n'
        "\n"
        "Golden DuckDB oracle for ``text_bpe_token_counts``: expected\n"
        "per-document BPE token counts frozen from the independent naive\n"
        "merge-replay encoder (see the generator docstring), keyed by a\n"
        "corpus signature so one SQL string covers sf0.001 and sf0.01 and\n"
        "returns zero rows (loud failure) on any other corpus.\n"
        '"""\n\n'
    )
    with open(OUT, "w") as f:
        f.write(header)
        f.write("TEXT_BPE_TOKEN_COUNTS_SQL = r'''\n")
        f.write(sql)
        f.write("\n'''\n")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
