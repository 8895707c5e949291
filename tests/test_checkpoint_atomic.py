"""Crash-atomicity + concurrency contracts of the checkpoint layer.

Reference semantics being preserved: the idempotent partition reset
(internal/matcher/shared.go:244-256) never half-exists — a re-run
either sees a complete stage or recomputes it. Here that contract is
extended to the METADATA: torn manifests read as not-done (recompute,
never crash), torn snapshot-log tails are dropped (the write they
described never committed), and two writers racing one (run, stage)
resolve with one loud loser (Iceberg optimistic concurrency), never
silent last-writer-wins.
"""

from __future__ import annotations

import json
import os

import pytest


def _df(spark, n=50):
    return spark.range(n).selectExpr("id", "id * 3 AS v")


def test_torn_manifest_reads_as_not_done_and_recomputes(spark, tmp_path_factory):
    """Kill mid-manifest-write (simulated by truncating the JSON file):
    is_done() must be False and stage() must RECOMPUTE — the old
    behavior crashed in json.load on resume."""
    from amp.checkpoint import CheckpointManager

    root = str(tmp_path_factory.mktemp("torn_manifest"))
    ck = CheckpointManager(spark, root, run_id=0)
    calls = {"n": 0}

    def thunk():
        calls["n"] += 1
        return _df(spark)

    ck.stage("nums", thunk)
    assert calls["n"] == 1

    mp = ck._manifest_path("nums")
    body = open(mp).read()
    with open(mp, "w") as fh:
        fh.write(body[: len(body) // 2])  # torn JSON

    assert not ck.is_done("nums")
    assert ck.current_snapshot("nums") is None
    assert not ck.verify_snapshot("nums")
    out = ck.stage("nums", thunk)  # recompute, no crash
    assert calls["n"] == 2
    assert out.count() == 50
    # and the rewritten manifest is whole again
    assert ck.is_done("nums") and ck.verify_snapshot("nums")


def test_torn_final_snapshot_log_line_is_dropped(spark, tmp_path_factory):
    """A crash mid-append leaves a torn last line; snapshots() must drop
    it (that write never committed its manifest) and the next write must
    derive its version from the surviving rows."""
    from amp.checkpoint import CheckpointManager

    root = str(tmp_path_factory.mktemp("torn_log"))
    ck = CheckpointManager(spark, root, run_id=0)
    ck.write(_df(spark), "nums")
    lp = ck._snapshot_log_path("nums")
    with open(lp, "a") as fh:
        fh.write('{"snapshot": "000002", "dig')  # torn append

    log = ck.snapshots("nums")
    assert [s["snapshot"] for s in log] == ["000001"]
    # next write: version derived from intact rows -> 000002 (idempotent
    # retry of the crashed write), log whole afterwards
    ck.write(_df(spark, 60), "nums")
    assert [s["snapshot"] for s in ck.snapshots("nums")] == ["000001", "000002"]
    assert ck.read("nums").count() == 60

    # a torn line NOT at the tail is real corruption -> loud failure
    rows = open(lp).read().splitlines()
    with open(lp, "w") as fh:
        fh.write(rows[0][:20] + "\n" + rows[1] + "\n")
    with pytest.raises(json.JSONDecodeError):
        ck.snapshots("nums")


def test_concurrent_writer_loses_loudly(spark, tmp_path_factory):
    """Two managers writing the same (run, stage): the one whose
    expected parent snapshot went stale must fail with
    ConcurrentWriteError, not silently overwrite the winner's commit."""
    from amp.checkpoint import CheckpointManager, ConcurrentWriteError

    root = str(tmp_path_factory.mktemp("two_writers"))
    ck1 = CheckpointManager(spark, root, run_id=0)
    ck2 = CheckpointManager(spark, root, run_id=0)

    # sequential writes from two managers are FINE (each re-reads the
    # log): versions chain 1 -> 2
    ck1.write(_df(spark), "nums")
    ck2.write(_df(spark, 60), "nums")
    log = ck2.snapshots("nums")
    assert [s["snapshot"] for s in log] == ["000001", "000002"]
    assert log[1]["parent"] == "000001"

    # the race: ck1 derived parent=2 ... ck2 commits 3 in between ...
    # ck1's commit must be rejected at the commit point
    entry = {"snapshot": "000003", "parent": "000002", "digest": "x",
             "rows": 0, "n_files": 0, "n_bytes": 0, "ts": 0.0}
    ck2.write(_df(spark, 70), "nums")  # advances to 000003
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        ck1._commit("nums", parent_id=2, entry=entry, manifest_row={})
    # winner's state intact
    assert ck2.current_snapshot("nums") == "000003"
    assert ck2.read("nums").count() == 70


def test_crashed_legacy_migration_leaves_readable_versioned_state(
    spark, tmp_path_factory
):
    """Crash window after _migrate_legacy_layout but before the NEW
    versioned write: the migration itself must upgrade the legacy
    manifest to point at snapshot 000000, so resume reads the relocated
    data at the right version with NO _v schema drift."""
    from amp.checkpoint import CheckpointManager

    root = str(tmp_path_factory.mktemp("legacy_crash"))
    ck = CheckpointManager(spark, root, run_id=0)

    # fabricate a legacy (pre-snapshot) checkpoint: flat run_id=0 layout
    # + manifest without snapshot_digest
    from pyspark.sql import functions as F

    _df(spark).withColumn("run_id", F.lit(0)).write.mode("overwrite").partitionBy(
        "run_id"
    ).parquet(ck.table_path("nums"))
    with open(ck._manifest_path("nums"), "w") as fh:
        json.dump({"run_id": 0, "stage": "nums", "rows": 50,
                   "path": ck.table_path("nums"), "snapshot": None}, fh)
    legacy_cols = set(ck.read("nums").columns)

    # migration runs, then "crash" before the new version is written
    ck._migrate_legacy_layout("nums")

    assert ck.current_snapshot("nums") == "000000"
    assert ck.verify_snapshot("nums")
    back = ck.read("nums")
    assert set(back.columns) == legacy_cols  # no _v drift
    assert back.count() == 50
    # and a later write() resumes the version chain at 000001
    ck.write(_df(spark, 80), "nums")
    assert ck.current_snapshot("nums") == "000001"
    assert ck.read("nums").count() == 80
    assert ck.read("nums", snapshot="000000").count() == 50


def test_expire_rewrite_is_atomic_file_swap(spark, tmp_path_factory):
    """expire_snapshots must never leave a half-written log: the rewrite
    goes through a temp file + os.replace (verified by the absence of
    in-place truncation artifacts and a whole log after expiry)."""
    from amp.checkpoint import CheckpointManager

    root = str(tmp_path_factory.mktemp("expire_atomic"))
    ck = CheckpointManager(spark, root, run_id=0)
    for n in (10, 20, 30):
        ck.write(_df(spark, n), "nums")
    expired = ck.expire_snapshots("nums", keep_last=1)
    assert expired == ["000001", "000002"]
    log = ck.snapshots("nums")
    assert [s["snapshot"] for s in log] == ["000003"]
    # no stray tmp files left behind
    d = os.path.join(root, "_manifest")
    assert not [f for f in os.listdir(d) if ".tmp." in f]
    # id derivation still monotonic after the truncated log
    ck.write(_df(spark, 40), "nums")
    assert ck.current_snapshot("nums") == "000004"


def _hold_stage_lock(ck, stage):
    """Acquire the stage's flock the way _commit does (separate fd)."""
    import fcntl

    lk = open(ck._snapshot_log_path(stage) + ".lock", "w")
    fcntl.flock(lk, fcntl.LOCK_EX)
    return lk


def test_expire_and_rollback_serialize_on_the_commit_lock(
    spark, tmp_path_factory
):
    """expire_snapshots and rollback mutate the snapshot log, so they
    must take the SAME flock as _commit — an expire racing a commit
    from a pre-commit log read would otherwise erase the just-committed
    row, and the next write would reuse its live version id."""
    import fcntl
    import threading

    from amp.checkpoint import CheckpointManager

    root = str(tmp_path_factory.mktemp("expire_lock"))
    ck = CheckpointManager(spark, root, run_id=0)
    ck.write(_df(spark), "nums")
    ck.write(_df(spark, 60), "nums")

    lk = _hold_stage_lock(ck, "nums")
    done = threading.Event()
    result: list = []

    def _expire():
        result.append(ck.expire_snapshots("nums", keep_last=1))
        done.set()

    t = threading.Thread(target=_expire, daemon=True)
    t.start()
    # while the lock is held, expire must BLOCK (not rewrite the log)
    assert not done.wait(timeout=1.0), "expire ran despite a held commit lock"
    assert [s["snapshot"] for s in ck.snapshots("nums")] == ["000001", "000002"]
    fcntl.flock(lk, fcntl.LOCK_UN)
    lk.close()
    assert done.wait(timeout=30.0)
    assert result == [["000001"]]
    assert [s["snapshot"] for s in ck.snapshots("nums")] == ["000002"]
    # next write derives from the retained max, never reuses 000002
    ck.write(_df(spark, 70), "nums")
    assert ck.current_snapshot("nums") == "000003"

    # rollback respects the same lock
    lk = _hold_stage_lock(ck, "nums")
    done2 = threading.Event()
    t2 = threading.Thread(
        target=lambda: (ck.rollback("nums", "000002"), done2.set()), daemon=True
    )
    t2.start()
    assert not done2.wait(timeout=1.0), "rollback ran despite a held lock"
    fcntl.flock(lk, fcntl.LOCK_UN)
    lk.close()
    assert done2.wait(timeout=30.0)
    assert ck.current_snapshot("nums") == "000002"
