"""Driver-contract surface: entry() smoke + a fast subset of the
queries()/oracle_sql() comparisons against DuckDB at sf0.001 (the full
set is exercised by scripts/check_oracles.py and by the driver itself
at sf0.01)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from scripts.check_oracles import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "normalize_project",
    "block_pairs_multipass",
    "tfidf_postings",
    "pair_tfidf_dot",
    "topk_per_group",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality",
    "agg_lineitem",
    "window_events_topk",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_query_has_oracle_or_reason():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    missing = set(qs) - set(os_)
    # only genuinely non-SQL/approximate ops may omit the oracle
    assert missing <= {"er_pipeline_clusters", "ann_lsh_topk"}, missing


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["cluster_size", "n_clusters"]
