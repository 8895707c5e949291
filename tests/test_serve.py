"""HTTP front door (reference pkg/api/router.go:38-42 shapes) + anchor
derivation for new domains."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def service(spark, small_corpus):
    from amp.serve import MatchService

    files, _ = small_corpus
    return MatchService.from_files(spark, files)


def _one_record(files):
    r = files.limit(1).collect()[0]
    return {
        "repo": "query/repo",
        "path": "query/" + r["path"],
        "commit": "f" * 40,
        "lang": r["lang"],
        "content": r["content"],
    }


def test_match_single_handler(spark, small_corpus, service):
    files, _ = small_corpus
    out = service.match_single(_one_record(files), top_n=3)
    assert out, "resubmitted record must match its index copy"
    best = min(out, key=lambda m: m["rank"])
    assert best["rank"] == 1 and best["score"] > 0.9
    assert all(set(m) >= {"query_id", "candidate_id", "score", "rank"} for m in out)


def test_match_batch_handler_and_validation(spark, small_corpus, service):
    files, _ = small_corpus
    rows = [_one_record(files) for _ in range(2)]
    rows[1] = dict(rows[1], path="other/" + rows[1]["path"])
    out = service.match_batch(rows, top_n=2)
    per_query: dict = {}
    for m in out:
        per_query.setdefault(m["query_id"], []).append(m)
    assert all(len(v) <= 2 for v in per_query.values())
    with pytest.raises(ValueError, match="missing fields"):
        service.match_single({"repo": "x"})


def test_http_roundtrip(spark, small_corpus, service):
    from amp.serve import serve

    files, _ = small_corpus
    httpd = serve(service, port=0)
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/match",
            data=json.dumps(_one_record(files)).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = json.load(r)
        assert body["matches"] and body["matches"][0]["rank"] == 1
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/match",
            data=b"{not json",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_derive_anchors_deterministic_and_usable():
    from amp.reference_parity import calculate_binary_key, derive_anchors

    streets = [f"{100 + 7 * i} {name} {kind}"
               for i, (name, kind) in enumerate(
                   (n, k) for n in ("oak", "elm", "pine", "cedar", "maple", "birch")
                   for k in ("road", "lane", "gate", "glade"))]
    a1 = derive_anchors(streets, k=10, seed=42)
    a2 = derive_anchors(streets, k=10, seed=42)
    assert a1 == a2
    assert len(a1) == 10 and len(set(a1)) == 10
    assert set(a1) <= set(streets)
    key = calculate_binary_key("214 pine gate", refs=a1)
    assert len(key) == 10 and set(key) <= {"0", "1"}
    with pytest.raises(ValueError, match="distinct"):
        derive_anchors(streets[:5], k=10)


def test_type_malformed_payload_is_400_not_500(spark, small_corpus, service):
    from amp.serve import serve

    httpd = serve(service, port=0)
    try:
        port = httpd.server_address[1]
        for body in (b"5", b'"abc"', b"[1, 2]"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/match", data=body, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400, body
    finally:
        httpd.shutdown()


def test_duplicates_cached_after_first_call(spark, small_corpus, service, monkeypatch):
    import amp.pipeline as P

    calls = {"n": 0}
    real = P.run_pipeline

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(P, "run_pipeline", counting)
    service._dup_df = None  # isolate from other tests
    a = service.duplicates(limit=50)
    b = service.duplicates(limit=50)
    assert a == b and len(a) > 0
    assert calls["n"] == 1  # second call served from the materialized table
    # refresh recomputes
    c = service.duplicates(limit=50, refresh=True)
    assert calls["n"] == 2 and c == a


def test_duplicates_refresh_reachable_over_http_and_metrics(
    spark, small_corpus, service, monkeypatch
):
    """The refresh knob must be reachable from the HTTP handler (a
    swapped index would otherwise serve stale clusters forever), and
    /metrics surfaces request counters + the dropped-block count."""
    import amp.pipeline as P
    from amp.serve import serve

    calls = {"n": 0}
    real = P.run_pipeline

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(P, "run_pipeline", counting)
    service._dup_df = None
    httpd = serve(service, port=0)
    try:
        port = httpd.server_address[1]

        def post(body: dict):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/duplicates",
                data=json.dumps(body).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return json.load(r)["clusters"]

        a = post({"limit": 30})
        assert calls["n"] == 1 and len(a) == 30
        b = post({"limit": 30})
        assert calls["n"] == 1 and b == a  # cached
        c = post({"limit": 30, "refresh": True})
        assert calls["n"] == 2 and c == a  # recomputed over HTTP

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            m = json.load(r)
        assert m["counters"]["duplicates_requests"] >= 3
        assert "dropped_blocks" in m["counters"]
    finally:
        httpd.shutdown()


def test_concurrent_requests_share_one_pipeline_run(
    spark, small_corpus, service, monkeypatch
):
    """Bounded-pool server: N parallel /duplicates requests all succeed
    and the pipeline runs ONCE (computation lock), not once per caller."""
    import threading

    import amp.pipeline as P
    from amp.serve import serve

    calls = {"n": 0}
    real = P.run_pipeline
    lock = threading.Lock()

    def counting(*a, **kw):
        with lock:
            calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(P, "run_pipeline", counting)
    service._dup_df = None
    httpd = serve(service, port=0, max_workers=4)
    try:
        port = httpd.server_address[1]
        results, errors = [], []

        def hit():
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/v1/duplicates",
                    data=json.dumps({"limit": 20}).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    results.append(json.load(r)["clusters"])
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(results) == 4
        assert all(r == results[0] for r in results)
        assert calls["n"] == 1, "concurrent callers must share one pipeline run"
    finally:
        httpd.shutdown()


def test_bad_limit_types_are_400_not_500(spark, small_corpus, service):
    """null/list/dict 'limit' values are client errors: the handler must
    classify them as 400, not fall through to the generic 500."""
    from amp.serve import serve

    httpd = serve(service, port=0)
    try:
        port = httpd.server_address[1]
        for limit in (None, [1], {"n": 1}, "abc"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/duplicates",
                data=json.dumps({"limit": limit}).encode(),
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400, limit
    finally:
        httpd.shutdown()


def test_http_workers_are_daemon_threads(spark, small_corpus, service):
    """Pool workers must be daemon: a request stuck in a hung Spark job
    must not block interpreter exit (concurrent.futures threads would
    be joined at shutdown)."""
    from amp.serve import serve

    httpd = serve(service, port=0)
    try:
        assert httpd._workers, "bounded worker pool expected"
        assert all(t.daemon for t in httpd._workers)
    finally:
        httpd.shutdown()


def test_duplicates_cache_hit_serves_during_refresh(
    spark, small_corpus, service, monkeypatch
):
    """While a refresh pipeline run holds the compute lock, a plain
    request must return the still-valid old pin immediately instead of
    blocking for the run's duration."""
    import threading
    import time as _time

    import amp.pipeline as P

    service._dup_df = None
    service.duplicates(limit=10)  # warm the pin

    real = P.run_pipeline
    entered = threading.Event()
    release = threading.Event()

    def slow(*a, **kw):
        entered.set()
        release.wait(timeout=60)
        return real(*a, **kw)

    monkeypatch.setattr(P, "run_pipeline", slow)
    t = threading.Thread(
        target=lambda: service.duplicates(limit=10, refresh=True), daemon=True
    )
    t.start()
    assert entered.wait(timeout=30), "refresh never reached the pipeline"
    t0 = _time.time()
    out = service.duplicates(limit=10)  # must NOT block on the refresh
    assert _time.time() - t0 < 5.0
    assert len(out) > 0
    release.set()
    t.join(timeout=120)
    assert not t.is_alive()


def test_metrics_get_is_side_effect_free(spark, small_corpus, service, tmp_path):
    """GET /metrics on a service with a checkpoint_root must not
    makedirs under the root or mutate session Spark conf (ADVICE r4:
    the old path constructed a CheckpointManager per request)."""
    from amp.serve import serve

    root = str(tmp_path / "ck_never_written")
    service.checkpoint_root = root
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    httpd = serve(service, port=0)
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            m = json.load(r)
        assert m["manifest"] == []
        import os

        assert not os.path.exists(root), "read-only GET created directories"
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            == before
        )
    finally:
        httpd.shutdown()
        httpd.server_close()
        delattr(service, "checkpoint_root")


def test_server_close_drains_queued_sockets(spark, small_corpus, service):
    """server_close must shut down still-queued connections instead of
    leaving them for (possibly exited) workers — fd leak at shutdown
    (ADVICE r4). Simulated with sentinel sockets queued directly."""
    from amp.serve import PooledHTTPServer, make_handler

    httpd = PooledHTTPServer(("127.0.0.1", 0), make_handler(service), max_workers=2)
    closed = []

    class FakeSock:
        def __init__(self, name):
            self.name = name

    httpd.shutdown_request = lambda req: closed.append(
        req.name if isinstance(req, FakeSock) else "real"
    )
    # the accept loop was never started (no serve_forever — calling
    # shutdown() here would wait forever on the never-set is_shut_down
    # event); stuff the hand-off queue as if connections raced in
    for i in range(3):
        httpd._q.put((FakeSock(f"s{i}"), ("127.0.0.1", 40000 + i)))
    httpd.server_close()
    import time as _time

    deadline = _time.time() + 10
    while len([c for c in closed if c.startswith("s")]) < 3 and _time.time() < deadline:
        _time.sleep(0.05)
    assert sorted(c for c in closed if c.startswith("s")) == ["s0", "s1", "s2"]
    # workers must exit on the sentinels
    for t in httpd._workers:
        t.join(timeout=10)
        assert not t.is_alive()
    # post-close connections are refused at process_request
    httpd.process_request(FakeSock("late"), ("127.0.0.1", 1))
    assert "late" in closed


def test_http_index_append_e2e(spark, small_corpus):
    """Round-5 task: POST /index/append extends the live index — the
    appended record becomes findable by /match, /metrics reflects the
    new index size, and the duplicates cache is invalidated."""
    from amp.serve import MatchService, serve

    files, _ = small_corpus
    svc = MatchService.from_files(spark, files)  # private: append mutates
    n0 = svc.index.records.count()
    # warm the duplicates cache so the append has something to invalidate
    svc.duplicates(limit=5)
    assert svc._dup_df is not None
    httpd = serve(svc, port=0)
    try:
        port = httpd.server_address[1]
        new_rec = {
            "repo": "appended/repo",
            "path": "brand/new/file.py",
            "commit": "a" * 40,
            "lang": "python",
            "content": "def appended_unique_marker():\n    return 'zxqv_97531'\n",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/index/append",
            data=json.dumps({"records": [new_rec]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body == {"appended": 1, "index_records": n0 + 1}
        assert svc._dup_df is None, "append must invalidate the dup cache"

        # the appended record is now matchable over HTTP
        q = dict(new_rec, repo="query/repo", commit="b" * 40)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/match",
            data=json.dumps(q).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            matches = json.loads(r.read())["matches"]
        assert matches, "query equal to the appended record must match it"
        best = min(matches, key=lambda m: m["rank"])
        assert best["score"] > 0.9

        # /metrics carries the counters + index size gauge
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            counters = json.loads(r.read())["counters"]
        assert counters["append_requests"] == 1
        assert counters["index_records"] == n0 + 1

        # malformed body is a 400, duplicate record_id append is a 400
        for bad in ({"records": "nope"}, [new_rec]):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/index/append",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_index_remove_e2e(spark, small_corpus):
    """POST /index/remove shrinks the live index: the removed record
    stops being matchable, /metrics reflects the new size, the
    duplicates cache is invalidated, and bad bodies are 400s."""
    from amp.serve import MatchService, serve

    from pyspark.sql import functions as F

    files, _ = small_corpus
    svc = MatchService.from_files(spark, files)
    n0 = svc.index.records.count()
    svc.duplicates(limit=5)  # warm the cache so remove invalidates it
    assert svc._dup_df is not None
    httpd = serve(svc, port=0)
    try:
        port = httpd.server_address[1]
        # remove one whole content (all its record ids) so no candidate
        # for that content can remain
        by_content = (
            svc.index.records.groupBy("content_sha")
            .agg(F.collect_list("record_id").alias("ids"),
                 F.first("repo").alias("repo"),
                 F.first("path").alias("path"),
                 F.first("commit").alias("commit"))
            .collect()
        )
        victim = sorted(by_content, key=lambda r: r["content_sha"])[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/index/remove",
            data=json.dumps({"record_ids": list(victim["ids"])}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body == {
            "removed": len(set(victim["ids"])),
            "index_records": n0 - len(set(victim["ids"])),
        }
        assert svc._dup_df is None, "remove must invalidate the dup cache"

        # an exact-copy query no longer matches any removed id
        src = files.where(
            (F.col("repo") == victim["repo"])
            & (F.col("path") == victim["path"])
            & (F.col("commit") == victim["commit"])
        ).collect()[0]
        q = {"repo": "query/repo", "path": "query/" + src["path"],
             "commit": "b" * 40, "lang": src["lang"],
             "content": src["content"]}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/match",
            data=json.dumps(q).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            matches = json.loads(r.read())["matches"]
        gone = set(victim["ids"])
        assert all(m["candidate_id"] not in gone for m in matches)

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            counters = json.loads(r.read())["counters"]
        assert counters["remove_requests"] == 1
        assert counters["index_records"] == n0 - len(set(victim["ids"]))

        # 400s: malformed body, unknown id, non-string ids
        for bad in ({"record_ids": "nope"}, ["no-such-id"], [42]):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/index/remove",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
