"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet tables via DuckDB, compare row count + column names +
order-insensitive value hash.

The DuckDB side is fetched through PANDAS (`.df()`), matching the
driver's fetch path: round 5 proved the driver coerces DuckDB HUGEINT
results to float64 (pack_documents hash_match=false while this
mirror's old `.fetchall()` leg — native ints — passed). A secondary
fetchall leg still runs and any divergence between the two legs is
reported, so a type-coercion gap between engines can never again hide
behind the fetch path.

Usage: python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from amp.session import get_spark

    spark = get_spark("oracle-check", cpus=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            pdf = con.sql(oracles[name]).df()
            ocols = list(pdf.columns)
            orows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
            raw = con.execute(oracles[name]).fetchall()
        except Exception as exc:
            print(f"✗ {name:28s} ORACLE SQL ERROR: {exc}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        ok_hash = sh == oh
        rawh = value_hash(ocols, raw)
        if rawh != oh:
            print(
                f"  {name:28s} NOTE: fetchall leg differs from pandas leg "
                f"({rawh} vs {oh}) — engine type coercion in play"
            )
        status = "✓" if (ok_rows and ok_cols and ok_hash) else "✗"
        if status == "✗":
            failures += 1
        print(
            f"{status} {name:28s} rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash {'ok' if ok_hash else f'{sh} vs {oh}'} ({time.time()-t0:.1f}s)"
        )
        if not ok_hash and ok_rows and ok_cols and len(srows) < 2000:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = {tuple(_norm_cell(r[i]) for i in order) for r in srows}
            oset = {tuple(_norm_cell(r[i]) for i in oorder) for r in orows}
            diff_s = list(sset - oset)[:3]
            diff_o = list(oset - sset)[:3]
            print(f"    cols(sorted): {sorted(scols)}")
            print(f"    spark-only: {diff_s}")
            print(f"    duck-only : {diff_o}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
