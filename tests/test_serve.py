"""HTTP front door (reference pkg/api/router.go:38-42 shapes) + anchor
derivation for new domains."""

from __future__ import annotations

import json
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
