"""Synthesize a 10x-scale documents/embeddings directory from sf0.1 for
the round-5 oracle drift spot-check (VERDICT r4 next-round task 6).

Each copy k>0 suffixes EVERY token with "qK" (alphanumeric — it must
SURVIVE the engine's [^a-z0-9]+ tokenizer; an underscore suffix splits
off and the copies' shingle sets then merge into 10x blocks and
quadratic pairs — measured: 56,159,813 LSH candidate pairs, which the
oracle verified hash-exact in 931 s before this fix, see
BENCH/SFBIG_ORACLES_r5.md) and offsets doc_id by k*100000, so copies
are mutually non-matching shards: total volume is 10x (tests
volume-dependent code paths — sampling thresholds, the contamination
broadcast gate crossing to the shuffled join, CC driver cutoff
pressure, AQE replans) while each oracle's cost stays ~10x sf0.1, not
quadratic. Density drift (denser near-dup clusters) is NOT exercised
by construction — the underscore run above covers the quadratic case.
The id stride is ≡ 0 (mod 20), preserving the contamination query's
doc_id%20 eval/train split per copy. n_chars is recomputed to stay
consistent with the mutated text. Other tables are symlinked from
sf0.1 (the checked queries only read documents/embeddings; the
symlinks satisfy check_oracles' view registration).

Usage: python scripts/make_sfbig.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_big10"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    parts = []
    for k in range(copies):
        if k == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'"
            )
        else:
            parts.append(
                f"SELECT doc_id + {k * 100000} AS doc_id, "
                f"regexp_replace(text, '(\\S+)', '\\1q{k}', 'g') AS text, "
                f"lang, source, "
                f"CAST(length(regexp_replace(text, '(\\S+)', '\\1q{k}', 'g')) AS BIGINT) AS n_chars "
                f"FROM '{SRC}/documents.parquet'"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        f"(FORMAT PARQUET)"
    )
    eparts = [
        f"SELECT vec_id + {k * 100000} AS vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet'"
        for k in range(copies)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(eparts)}) TO '{out}/embeddings.parquet' "
        f"(FORMAT PARQUET)"
    )
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    n = con.execute(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"{out}: documents={n} ({copies} copies)")


if __name__ == "__main__":
    main()
