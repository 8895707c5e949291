"""Synthesize an sf1.0-DENSITY mimic of the driver's testdata for round-6
performance work.

The driver's round-end measurement ran at sf=1.0 (BENCH_r05.json:
"sf_escalated_from": 0.1) on a driver-generated directory we do not
have. Its generative law is inferable from sf0.001/0.01/0.1:

  documents:  n = max(500, 50000*sf) rows; 5 langs (en ~41%, the rest
              ~15% each); 20 uniform sources; text = 8..100 tokens drawn
              from a 30-word vocabulary; ~5%% of docs are near-dup copies
              of an earlier doc with a few token edits plus a rare 'dup'
              token; n_chars = len(text). The (lang, source) group count
              stays 100 at every sf, so candidate pairs grow ~sf^2 —
              exactly the regime where pair_tfidf_dot/rank_window blew up
              to 244s/193s in the driver run.
  embeddings: n = 20000*sf unit-norm 64-d vectors in ~10 gaussian
              clusters (labels), calibrated so cos>=0.3 density is in
              the same regime as sf0.1 extrapolated.
  TPC-H-ish:  x10 volume with key offsets that preserve referential
              integrity (these queries are ~1%% of the headline wall).

NOT used for correctness (oracles run on the real testdata); this is a
measurement corpus whose density matches the driver's sf1.0 so that
optimizations are tuned against quadratic pair growth, not the linear
make_sfbig.py layout.

Usage: python scripts/make_sf1_mimic.py [out_dir] [sf]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    doc_ids = np.arange(n, dtype=np.int64)
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    sources = rng.integers(0, 20, size=n)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            # near-dup: copy an earlier doc, a few token edits + 'dup'
            base = texts[rng.integers(0, i)].split()
            for _ in range(rng.integers(1, 4)):
                base[rng.integers(0, len(base))] = (
                    "dup" if rng.random() < 0.5 else VOCAB[rng.integers(0, 30)]
                )
            texts.append(" ".join(base))
        else:
            L = rng.integers(8, 101)
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, 30, size=L)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": [LANGS[k] for k in langs],
            "source": [f"src{s}" for s in sources],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    dim, n_lab = 64, 10
    centers = rng.normal(size=(n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, size=n)
    # sigma calibrated against sf0.1: cos>=0.3 density there (14,922 of
    # 2M pairs, 0.75%) is what pure-noise 64-d unit vectors produce
    # (P(cos>=0.3) ~ 0.8%), so cluster pull is weak
    vecs = centers[labels] + rng.normal(size=(n, dim)) * 0.55
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": labels.astype(np.int64),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(max(500, int(50_000 * sf)), rng),
                   f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(int(20_000 * sf), rng),
                   f"{out}/embeddings.parquet")

    con = duckdb.connect()
    copies = max(1, int(round(sf / 0.1)))

    def xcopy(table: str, sql_copy) -> None:
        parts = [sql_copy(k) for k in range(copies)]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET)"
        )

    xcopy("customer", lambda k: (
        f"SELECT c_custkey + {k * 15000} AS c_custkey, "
        f"* EXCLUDE (c_custkey) FROM '{SRC}/customer.parquet'"))
    xcopy("orders", lambda k: (
        f"SELECT o_orderkey + {k * 150000} AS o_orderkey, "
        f"o_custkey + {k * 15000} AS o_custkey, "
        f"* EXCLUDE (o_orderkey, o_custkey) FROM '{SRC}/orders.parquet'"))
    xcopy("lineitem", lambda k: (
        f"SELECT l_orderkey + {k * 150000} AS l_orderkey, "
        f"* EXCLUDE (l_orderkey) FROM '{SRC}/lineitem.parquet'"))
    xcopy("events", lambda k: (
        f"SELECT event_id + {k * 1000000} AS event_id, "
        f"user_id + {k * 1500} AS user_id, "
        f"* EXCLUDE (event_id, user_id) FROM '{SRC}/events.parquet'"))
    for t in ["region", "nation", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
    n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    p = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' l "
        f"JOIN '{out}/documents.parquet' r ON l.lang=r.lang AND "
        f"l.source=r.source AND l.doc_id<r.doc_id"
    ).fetchone()[0]
    print(f"{out}: documents={n} src_pairs={p}")


if __name__ == "__main__":
    main()
