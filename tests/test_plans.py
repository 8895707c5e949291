"""Physical-plan regression gates: the plan you'd want at 100x, not
just the first one that passed.

  * No CartesianProduct / BroadcastNestedLoopJoin anywhere except the
    explicitly-whitelisted tiny tile/probe pairings (bounded row counts
    by construction).
  * Query-side selections reach the parquet scan (PushedFilters).
  * The ANN query side is broadcast (corpus streams, never shuffles).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# queries whose plans legitimately contain a nested-loop pairing:
#   dedup_embedding_cosine — T x T tile-pair join, T = ceil(n/tile_size)
#     rows total (the payload rides INSIDE the rows; the NLJ touches
#     only T^2/2 combinations of collected tiles)
#   ann_bruteforce_topk / match_provided_embedding_topk — corpus x
#     BROADCAST(small query batch) with no equi-key by definition
#     (exact all-corpus scoring); the broadcast side is the bounded one
#     and the corpus streams through exactly once
NLJ_ALLOWED = {
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "match_provided_embedding_topk",
}
# runs the full ER pipeline (datagen + pandas kernels); audited via the
# stage-budget tables in BENCH/BASELINE.md instead
SKIP = {"er_pipeline_clusters"}


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as E

    out = {}
    for name, fn in E.queries().items():
        if name in SKIP:
            continue
        out[name] = _physical_plan(fn(spark, SF))
    return out


def test_no_unexpected_nested_loop_or_cartesian(plans):
    bad = {}
    for name, plan in plans.items():
        if name in NLJ_ALLOWED:
            continue
        for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if marker in plan:
                bad[name] = marker
    assert not bad, f"unexpected product joins: {bad}"


def test_ann_query_side_filter_pushed_to_scan(plans):
    # vec_id < 10 selection must reach the parquet reader, not a
    # post-scan Filter over the full table (join-shaped ANN paths; the
    # GEMM paths collect the query side in a separate pruned job and
    # are gated below)
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        plan = plans[name]
        assert "PushedFilters: [" in plan
        assert "LessThan(vec_id,10)" in plan.replace(" ", "").replace("\n", ""), name


def test_ann_broadcasts_query_side(plans):
    for name in ("ann_lsh_topk",):
        assert "BroadcastExchange" in plans[name], name


def test_ann_gemm_paths_stream_corpus_once(plans):
    # round-6 shape for the exact scorers: the collected query matrix
    # rides in a broadcast closure, the corpus streams straight into
    # MapInPandas, and the ONLY Exchange in the plan is the top-k
    # window's hashpartitioning over the narrow scored stream — the
    # corpus itself never shuffles
    import re

    for name in ("ann_bruteforce_topk", "match_provided_embedding_topk"):
        plan = plans[name]
        assert "MapInPandas" in plan, name
        data_exchanges = [
            l for l in plan.splitlines()
            if "Exchange" in l and "BroadcastExchange" not in l
            # session.spread_to_cores' small-input round-robin is the
            # documented local-parallelism spread (no-op at scale), not
            # a corpus shuffle
            and "RoundRobinPartitioning" not in l
        ]
        assert len(data_exchanges) == 1 and "query_id" in data_exchanges[0], (
            name, data_exchanges)


def test_scans_prune_columns(plans):
    # normalize_project touches only doc_id + text: the scan must not
    # read the remaining document columns
    squashed = plans["normalize_project"].replace(" ", "").replace("\n", "")
    assert "ReadSchema:struct<doc_id:bigint,text:string>" in squashed


def test_single_scan_text_ops_have_no_shuffle(plans):
    # these are pure per-row column pipelines (or mapInPandas chains for
    # the compression round trip) — at 100 TB an Exchange here would be
    # a scale bug, not a tuning choice
    for name in (
        "normalize_project",
        "text_token_counts",
        "text_quality",
        "text_lang_id",
        "text_fingerprints",
        "text_repetition",
        "text_pii",
        "text_decompress_roundtrip",
    ):
        assert "Exchange" not in plans[name], (
            name, plans[name][:2000])


def test_pack_documents_single_exchange(plans):
    # the packing manifest is ONE shuffle (hash by shard) + one window
    # cumsum — a second Exchange would mean the window re-partitioned
    import re

    plan = plans["pack_documents"]
    assert len(re.findall(r"Exchange", plan)) == 1, plan[:2000]
    assert "hashpartitioning(shard" in plan


def test_mixture_sample_corpus_never_shuffled(plans):
    # the corpus side must reach the filter via a broadcast join; the
    # only shuffles are the tiny counts agg (map-side combinable) and
    # the single-partition global-min window over it
    import re

    plan = plans["mixture_sample"]
    assert "BroadcastHashJoin" in plan
    non_bcast = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(non_bcast) == 2, non_bcast
    assert any("SinglePartition" in l for l in non_bcast)
