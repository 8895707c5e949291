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


def _split_files(files):
    """Deterministic disjoint split of the corpus into (base, appended)."""
    base = files.where(F.crc32(F.col("path")) % 5 != 0)
    extra = files.where(F.crc32(F.col("path")) % 5 == 0)
    return base, extra


def test_append_records_frozen_idf_equals_fresh_frozen_build(spark, small_corpus):
    """MatchIndex.append contract (reference run-0 resync,
    cmd/addressmatchpro/main.go:73-90, without the full rebuild): under
    the frozen-IDF policy the appended index's records + side features
    must equal a fresh build over the union WITH THE SAME dictionary —
    including representative swaps where an appended record id undercuts
    an existing content's representative."""
    from amp.incremental import append_records

    files, _ = small_corpus
    base, extra = _split_files(files)
    assert extra.count() > 0 and base.count() > 0
    idx0 = build_index(base, CFG)
    appended = append_records(idx0, extra, policy="frozen")
    fresh = build_index(files, CFG, idf_override=idx0.idf)

    assert appended.records.count() == fresh.records.count()
    a_sides = {r["record_id"]: r for r in appended.sides.collect()}
    f_sides = {r["record_id"]: r for r in fresh.sides.collect()}
    assert set(a_sides) == set(f_sides)
    for rid, fr in f_sides.items():
        ar = a_sides[rid]
        assert ar["tfblob"] == fr["tfblob"], rid
        assert list(ar["sig"]) == list(fr["sig"]), rid
        assert list(ar["embedding"]) == list(fr["embedding"]), rid
    assert appended.idf == idx0.idf  # frozen, by identity of contract


def test_append_then_match_finds_new_record(spark, small_corpus):
    from amp.incremental import append_records

    files, _ = small_corpus
    base, extra = _split_files(files)
    idx0 = build_index(base, CFG)
    idx1 = append_records(idx0, extra, policy="frozen")

    one = extra.limit(1).collect()[0]
    q = amp_io.single_record(
        spark, "query/repo", "query/" + one["path"], "f" * 40, one["lang"],
        one["content"],
    )
    out = match_records(idx1, q, run_id=9, top_n=5).collect()
    assert out, "appended record must be findable"
    best = min(out, key=lambda r: r["rank"])
    assert best["rank"] == 1 and best["score"] > 0.9

    # frozen scores == fresh-frozen-build scores for the same query
    fresh = build_index(files, CFG, idf_override=idx0.idf)
    out_f = match_records(fresh, q, run_id=9, top_n=5).collect()
    got = {(r["candidate_id"]): r["score"] for r in out}
    want = {(r["candidate_id"]): r["score"] for r in out_f}
    assert got == want


def test_append_refresh_policy_recomputes_idf(spark, small_corpus):
    from amp.incremental import append_records

    files, _ = small_corpus
    base, extra = _split_files(files)
    idx0 = build_index(base, CFG)
    idx1 = append_records(idx0, extra, policy="refresh")
    fresh = build_index(files, CFG)
    assert idx1.idf == fresh.idf  # zero drift under refresh
    with pytest.raises(ValueError, match="insert-only"):
        append_records(idx1, extra)  # same ids again -> loud failure



def test_remove_records_frozen_equals_fresh_frozen_build(spark, small_corpus):
    """MatchIndex.remove contract (inverse of append; the reference
    only removes via resync truncate+reload): under the frozen policy
    the shrunken index's records + side features equal a fresh build
    over the survivors WITH THE SAME dictionary — including
    representative swaps where the removed record WAS a content's
    representative."""
    from amp.incremental import remove_records

    files, _ = small_corpus
    idx0 = build_index(files, CFG)
    # remove: every record of one whole content, the REPRESENTATIVE of
    # a multi-row content (forcing a swap), and one non-representative
    by_content = (
        idx0.records.groupBy("content_sha")
        .agg(F.collect_list("record_id").alias("ids"))
        .collect()
    )
    multi = sorted(
        (r for r in by_content if len(r["ids"]) >= 2),
        key=lambda r: r["content_sha"],
    )
    assert len(multi) >= 2, "small_corpus must contain duplicate contents"
    gone_whole = sorted(multi[0]["ids"])            # whole content vanishes
    swap_rep = [sorted(multi[1]["ids"])[0]]         # rep dies, content stays
    non_rep = [sorted(multi[1]["ids"])[-1]] if len(multi[1]["ids"]) > 2 else []
    removed = gone_whole + swap_rep + non_rep
    idx1 = remove_records(idx0, removed, policy="frozen")

    from amp.normalize import record_id_expr

    remaining = files.withColumn("record_id", record_id_expr()).join(
        spark.createDataFrame([(i,) for i in removed], "record_id string"),
        "record_id", "left_anti",
    ).drop("record_id")
    fresh = build_index(remaining, CFG, idf_override=idx0.idf)
    assert idx1.records.count() == fresh.records.count()
    a = {r["record_id"]: r for r in idx1.sides.collect()}
    f = {r["record_id"]: r for r in fresh.sides.collect()}
    assert set(a) == set(f)
    # the swap happened: the dead rep's side row is gone, the content's
    # new winner is present
    assert swap_rep[0] not in a
    for rid, fr in f.items():
        ar = a[rid]
        assert ar["tfblob"] == fr["tfblob"], rid
        assert list(ar["sig"]) == list(fr["sig"]), rid
        assert list(ar["embedding"]) == list(fr["embedding"]), rid
    assert idx1.idf == idx0.idf


def test_remove_then_match_no_longer_finds_record(spark, small_corpus):
    from amp.incremental import remove_records

    files, _ = small_corpus
    idx0 = build_index(files, CFG)
    by_content = (
        idx0.records.groupBy("content_sha")
        .agg(F.collect_list("record_id").alias("ids"),
             F.first("repo").alias("repo"),
             F.first("path").alias("path"),
             F.first("commit").alias("commit"))
        .collect()
    )
    victim = sorted(by_content, key=lambda r: r["content_sha"])[0]
    idx1 = remove_records(idx0, list(victim["ids"]), policy="frozen")
    src = files.where(
        (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
        & (F.col("commit") == victim["commit"])
    ).collect()[0]
    q = amp_io.single_record(
        spark, "query/repo", "query/" + src["path"], "f" * 40,
        src["lang"], src["content"],
    )
    out = match_records(idx1, q, run_id=11, top_n=5).collect()
    gone = set(victim["ids"])
    assert all(r["candidate_id"] not in gone for r in out)


def test_remove_records_error_contract(spark, small_corpus):
    from amp.incremental import remove_records

    files, _ = small_corpus
    idx0 = build_index(files, CFG)
    all_ids = [r["record_id"] for r in idx0.records.select("record_id").collect()]
    with pytest.raises(ValueError, match="not in"):
        remove_records(idx0, ["no-such-id"])
    with pytest.raises(ValueError, match="empty id list"):
        remove_records(idx0, [])
    with pytest.raises(ValueError, match="empty the index"):
        remove_records(idx0, all_ids)
    with pytest.raises(ValueError, match="unknown policy"):
        remove_records(idx0, all_ids[:1], policy="nope")


def test_remove_refresh_policy_recomputes_idf(spark, small_corpus):
    from amp.incremental import remove_records

    files, _ = small_corpus
    base, extra = _split_files(files)
    idx0 = build_index(files, CFG)
    extra_ids = [
        r["record_id"]
        for r in build_index(extra, CFG).records.select("record_id").collect()
    ]
    idx1 = remove_records(idx0, extra_ids, policy="refresh")
    fresh = build_index(base, CFG)
    assert idx1.idf == fresh.idf  # zero drift under refresh


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


def test_index_save_load_identical_matches(spark, small_corpus, index, tmp_path_factory):
    """Durable run-0 bootstrap (reference main.go:92-173): save ->
    load -> match_records must reproduce the in-memory index's results
    exactly."""
    from amp.incremental import MatchIndex

    files, _ = small_corpus
    root = str(tmp_path_factory.mktemp("index_ck"))
    index.save(root)
    loaded = MatchIndex.load(spark, root)
    assert loaded.idf == index.idf
    assert loaded.cfg == index.cfg

    q = files.limit(15)
    key = lambda r: (r["query_id"], r["candidate_id"])  # noqa: E731
    got_mem = sorted(
        (tuple(r) for r in match_records(index, q, run_id=9, top_n=5).collect()),
        key=lambda t: (t[0], t[1]),
    )
    got_disk = sorted(
        (tuple(r) for r in match_records(loaded, q, run_id=9, top_n=5).collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert got_mem == got_disk


def test_build_index_with_provided_embeddings(spark, small_corpus):
    """Precomputed-embedding ingest: provided vectors replace the
    hashing-trick ones (unit-normalized), and the match path runs on
    them end-to-end."""
    import numpy as np

    from amp import normalize
    from amp.incremental import build_index

    files, _ = small_corpus
    recs = normalize.normalize(files, CFG, run_id=0)
    reps_ids = [r["record_id"] for r in
                normalize.representatives(recs).select("record_id").collect()]
    rng = np.random.RandomState(13)
    prov = spark.createDataFrame(
        [(rid, [float(x) for x in rng.standard_normal(8)]) for rid in sorted(reps_ids)],
        "record_id string, embedding array<float>",
    )
    idx = build_index(files, CFG, embeddings=prov)
    # every side vector is unit-norm and 8-dim (the provided dim, not cfg.emb_dim)
    import math

    sample = idx.sides.select("record_id", "embedding").limit(20).collect()
    for r in sample:
        assert len(r["embedding"]) == 8
        n = math.sqrt(sum(float(x) ** 2 for x in r["embedding"]))
        assert n == pytest.approx(1.0, abs=1e-5)
    # match requires query-side vectors of the same model/dim
    qfiles = files.limit(5)
    with pytest.raises(ValueError, match="provided embeddings"):
        match_records(idx, qfiles, run_id=11, top_n=3)
    q_ids = [r["record_id"] for r in
             normalize.normalize(qfiles, CFG, run_id=11).select("record_id").collect()]
    q_prov = spark.createDataFrame(
        [(rid, [float(x) for x in rng.standard_normal(8)]) for rid in sorted(q_ids)],
        "record_id string, embedding array<float>",
    )
    out = match_records(idx, qfiles, run_id=11, top_n=3, query_embeddings=q_prov)
    assert out.count() > 0


def test_attach_embeddings_requires_full_coverage(spark, small_corpus):
    from amp import normalize, scoring
    from amp.features import idf_map

    files, _ = small_corpus
    reps = normalize.representatives(normalize.normalize(files, CFG, run_id=0))
    idf = idf_map(reps, reps.count(), CFG)
    sides = scoring.side_features_onepass(reps, idf, CFG)
    one_id = reps.select("record_id").limit(1).collect()[0][0]
    partial = spark.createDataFrame(
        [(one_id, [1.0, 0.0])], "record_id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no provided embedding"):
        scoring.attach_embeddings(sides, partial)


def test_stateful_dedup_stream_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState exact-dedup: state (canonical id per
    fingerprint) must survive across micro-batches — a duplicate
    arriving in batch 2 points at the canonical chosen in batch 1."""
    import time

    land = str(tmp_path_factory.mktemp("dedup_land"))
    schema = "record_id string, content_sha string, lang string, n_chars int"
    b1 = spark.createDataFrame(
        [("r1", "A", "py", 10), ("r2", "A", "py", 10), ("r3", "B", "go", 20)], schema
    )
    b1.coalesce(1).write.mode("append").parquet(land)

    from amp import streaming

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(land)
    q = (
        streaming.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame([("r4", "A", "py", 10), ("r5", "C", "js", 5)], schema)
        b2.coalesce(1).write.mode("append").parquet(land)
        q.processAllAvailable()
        rows = {r["record_id"]: r for r in spark.table("dedup_out").collect()}
    finally:
        q.stop()

    assert rows["r1"]["is_duplicate"] is False and rows["r1"]["canonical_id"] == "r1"
    assert rows["r2"]["is_duplicate"] is True and rows["r2"]["canonical_id"] == "r1"
    # state crossed the batch boundary:
    assert rows["r4"]["is_duplicate"] is True and rows["r4"]["canonical_id"] == "r1"
    assert rows["r3"]["is_duplicate"] is False
    assert rows["r5"]["is_duplicate"] is False


def test_ingest_stats_stream_windowed_counts(spark, tmp_path_factory):
    land = str(tmp_path_factory.mktemp("stats_land"))
    schema = "record_id string, content_sha string, lang string, n_chars int"
    spark.createDataFrame(
        [(f"r{i}", f"s{i}", "py" if i % 2 else "go", 10 * (i + 1)) for i in range(8)],
        schema,
    ).coalesce(1).write.mode("append").parquet(land)

    from amp import streaming

    stream = spark.readStream.schema(schema).parquet(land)
    q = (
        streaming.ingest_stats_stream(stream)
        .writeStream.format("memory")
        .queryName("stats_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("stats_out").collect()
    finally:
        q.stop()
    assert sum(r["n_records"] for r in rows) == 8
    by_lang = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_records"]
    assert by_lang == {"py": 4, "go": 4}
    assert all(r["window"].start is not None for r in rows)


def test_match_stream_continuous_matching(spark, small_corpus, index, tmp_path_factory):
    """foreachBatch continuous matching: files landing in the stream
    directory are matched against the prebuilt index per micro-batch
    (the streaming form of the reference's POST /match loop)."""
    from amp import streaming

    files, _ = small_corpus
    land = str(tmp_path_factory.mktemp("match_land"))
    ckp = str(tmp_path_factory.mktemp("match_ck"))
    # resubmit 3 known index records as the query stream — under a new
    # repo so the query record_ids differ from their index copies
    # (match_records excludes identical-id self pairs)
    files.limit(3).withColumn(
        "repo", F.concat(F.lit("query/"), F.col("repo"))
    ).write.mode("append").parquet(land)

    got: list = []

    def on_batch(matches_df, epoch_id):
        got.extend(matches_df.collect())

    stream = streaming.read_file_stream(spark, land)
    q = streaming.match_stream(stream, index, on_batch, checkpoint_path=ckp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert got, "stream batch produced no matches"
    best_by_query: dict = {}
    for r in got:
        cur = best_by_query.get(r["query_id"])
        if cur is None or r["rank"] < cur["rank"]:
            best_by_query[r["query_id"]] = r
    # every resubmitted record finds its exact index copy at rank 1
    assert len(best_by_query) == 3
    for r in best_by_query.values():
        assert r["rank"] == 1 and r["score"] > 0.9


def test_dedup_stream_rocksdb_state_store_restart(spark, tmp_path_factory):
    """The 100-TB state story end-to-end: dedup_stream under the
    RocksDB state store, stopped mid-stream and RESTARTED from its
    checkpoint — state (the canonical id chosen in batch 1) must
    survive the restart, and no batch may be emitted twice."""
    from amp import streaming

    land = str(tmp_path_factory.mktemp("rdb_land"))
    outp = str(tmp_path_factory.mktemp("rdb_out"))
    ckp = str(tmp_path_factory.mktemp("rdb_ck"))
    schema = "record_id string, content_sha string, lang string, n_chars int"

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    streaming.use_rocksdb_state_store(spark)
    try:

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            return (
                streaming.dedup_stream(stream)
                .writeStream.format("parquet")
                .option("path", outp)
                .option("checkpointLocation", ckp)
                .outputMode("append")
                .start()
            )

        spark.createDataFrame(
            [("r1", "A", "py", 10), ("r2", "A", "py", 10), ("r3", "B", "go", 20)],
            schema,
        ).coalesce(1).write.mode("append").parquet(land)
        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # crash/restart boundary: new files land while the query is down
        spark.createDataFrame(
            [("r4", "A", "py", 10), ("r5", "C", "js", 5)], schema
        ).coalesce(1).write.mode("append").parquet(land)
        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    rows = spark.read.parquet(outp).collect()
    by_id = {r["record_id"]: r for r in rows}
    # exactly-once: every record emitted exactly once across the restart
    assert len(rows) == 5 and len(by_id) == 5
    # state survived the restart: r4's duplicate verdict points at the
    # canonical chosen before the stop
    assert by_id["r4"]["is_duplicate"] is True
    assert by_id["r4"]["canonical_id"] == "r1"
    assert by_id["r1"]["is_duplicate"] is False
    assert by_id["r5"]["is_duplicate"] is False


def test_dedup_stream_state_ttl_evicts(spark, tmp_path_factory):
    """state_ttl_ms: an idle fingerprint is evicted, so a duplicate
    arriving after eviction is re-admitted as a new canonical (the
    documented bounded-state tradeoff).

    NB: with ProcessingTimeTimeout the engine keeps scheduling no-data
    micro-batches to fire timeouts, so processAllAvailable() never
    settles — the test polls the sink instead."""
    import time

    from amp import streaming

    land = str(tmp_path_factory.mktemp("ttl_land"))
    schema = "record_id string, content_sha string, lang string, n_chars int"
    spark.createDataFrame([("r1", "A", "py", 10)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(land)
    )
    q = (
        streaming.dedup_stream(stream, state_ttl_ms=500)
        .writeStream.format("memory")
        .queryName("ttl_out")
        .outputMode("append")
        .start()
    )

    def wait_rows(n, deadline=60):
        t0 = time.time()
        rows = []
        while time.time() - t0 < deadline:
            rows = spark.table("ttl_out").collect()
            if len(rows) >= n:
                return rows
            time.sleep(0.5)
        raise TimeoutError(f"sink has {len(rows)} rows, wanted {n}")

    try:
        wait_rows(1)
        time.sleep(1.2)  # let the 500ms TTL lapse in processing time
        # the same fingerprint arrives again — its state was evicted by
        # an intervening timeout batch, so it must be re-admitted as its
        # own canonical
        spark.createDataFrame([("r9", "A", "py", 10)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)
        rows = {r["record_id"]: r for r in wait_rows(2)}
    finally:
        q.stop()

    assert rows["r1"]["is_duplicate"] is False
    assert rows["r9"]["is_duplicate"] is False, "fingerprint A was not evicted"
    assert rows["r9"]["canonical_id"] == "r9"


def test_match_stream_restart_exactly_once(spark, small_corpus, index, tmp_path_factory):
    """match_stream across a stop/restart cycle from one checkpoint:
    no query record is matched twice (no epoch replay of committed
    batches) and none is lost (files landing while the query was down
    are picked up on restart)."""
    from amp import streaming

    files, _ = small_corpus
    land = str(tmp_path_factory.mktemp("ms_land"))
    ckp = str(tmp_path_factory.mktemp("ms_ck"))

    got: list = []

    def on_batch(matches_df, epoch_id):
        got.extend((epoch_id, r) for r in matches_df.collect())

    def start():
        return streaming.match_stream(
            streaming.read_file_stream(spark, land), index, on_batch,
            checkpoint_path=ckp,
        )

    files.limit(3).withColumn(
        "repo", F.concat(F.lit("q1/"), F.col("repo"))
    ).write.mode("append").parquet(land)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_first = len({r["query_id"] for _, r in got})
    assert n_first == 3

    # down period: two more query records land
    files.limit(5).subtract(files.limit(3)).withColumn(
        "repo", F.concat(F.lit("q2/"), F.col("repo"))
    ).write.mode("append").parquet(land)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    seen_epochs_per_query: dict = {}
    for epoch, r in got:
        seen_epochs_per_query.setdefault(r["query_id"], set()).add(epoch)
    # none lost: all 5 distinct query records matched
    assert len(seen_epochs_per_query) == 5
    # none duplicated: each query matched in exactly one epoch
    assert all(len(v) == 1 for v in seen_epochs_per_query.values())
