"""Incremental (query-vs-index) matching and streaming ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amp import io as amp_io
from amp.config import DEFAULT_CONFIG as CFG
from amp.incremental import build_index, match_records


@pytest.fixture(scope="module")
def index(spark, small_corpus):
    files, _ = small_corpus
    return build_index(files, CFG)


def test_match_single_record_finds_its_duplicate(spark, small_corpus, index):
    """Reference §3.1 single-match: a record re-submitted as a query
    must rank its own index copy first with a saturated score."""
    files, _ = small_corpus
    one = files.limit(1).collect()[0]
    q = amp_io.single_record(
        spark, "query/repo", "query/" + one["path"], "f" * 40, one["lang"], one["content"]
    )
    out = match_records(index, q, run_id=7, top_n=5).collect()
    assert out, "no candidates returned"
    best = min(out, key=lambda r: r["rank"])
    assert best["rank"] == 1
    assert best["score"] > 0.9  # exact-content copy
    assert all(r["query_id"] == best["query_id"] for r in out)


def test_match_batch_topk_bounded(spark, small_corpus, index):
    files, _ = small_corpus
    q = files.limit(20)
    out = match_records(index, q, run_id=8, top_n=3)
    per_query = out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert per_query <= 3


def test_streaming_ingest_normalizes_like_batch(spark, small_corpus, tmp_path_factory):
    from amp import normalize, streaming

    files, _ = small_corpus
    land = str(tmp_path_factory.mktemp("land"))
    outp = str(tmp_path_factory.mktemp("records_out"))
    ckp = str(tmp_path_factory.mktemp("stream_ck"))
    sample = files.limit(40)
    sample.write.mode("overwrite").parquet(land)

    stream = streaming.read_file_stream(spark, land)
    assert stream.isStreaming
    q = streaming.ingest_to_parquet(streaming.normalize_stream(stream, CFG), outp, ckp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(outp)
    want = normalize.normalize(sample, CFG)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_csv_roundtrip_preserves_content_sha(spark, small_corpus, tmp_path_factory):
    """S1 parity: CSV load must not corrupt multiline content — the
    per-row sha256 invariant catches any mangling."""
    from amp import normalize

    files, _ = small_corpus
    sample = files.limit(25)
    p = str(tmp_path_factory.mktemp("csv")) + "/files.csv"
    sample.toPandas().to_csv(p, index=False)
    back = amp_io.read_repo_files(spark, p, fmt="csv")
    a = normalize.normalize(sample, CFG).select("record_id", "content_sha")
    b = normalize.normalize(back, CFG).select("record_id", "content_sha")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
