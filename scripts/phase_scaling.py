"""Per-phase scaling account — the decisive evidence behind the
N-vs-4N gate interpretation (BENCH/BASELINE.md).

Runs the ER pipeline's default path phase by phase (same pins, same
config as amp.pipeline.run_pipeline) over the pre-generated scaling
corpus and times each phase. One invocation = one parallelism level in
this process; --both spawns a subprocess per level (a JVM cannot change
master in-process) and prints the combined table with per-phase 4x
efficiency.

    python scripts/phase_scaling.py --both --lo 2 --hi 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES = [
    "normalize+pin",
    "uniqueness_probe",
    "reps+pin",
    "sides(idf+features)+pin",
    "pairs+joins+score+pin",
    "edges+cc",
    "counts",
]


def _stage_snapshot(spark) -> dict[int, dict]:
    """Completed-stage metrics from the UI REST API (requires the UI
    enabled). Keyed by stage id; used to attribute stages to phases."""
    from bench import completed_stages

    stages = completed_stages(spark)
    return {
        s["stageId"]: {
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks", 0),
            "exec_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
            "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        }
        for s in stages
    }


def run_phases(cpus: int, n_base: int, stages: bool = False) -> dict:
    from bench import _corpus_path, _warmup
    from amp import blocking, cluster, normalize, rank, scoring
    from amp.config import DEFAULT_CONFIG as cfg
    from amp.features import idf_map
    from amp.session import get_spark, shuffle_partitions_for
    from pyspark.sql import functions as F

    spark = get_spark(
        "phase-scaling", cpus=cpus,
        shuffle_partitions=shuffle_partitions_for(cpus, n_base),
        extra_conf={"spark.ui.enabled": "true"} if stages else None,
    )
    path = _corpus_path(spark, n_base)
    _warmup(spark)
    t: dict[str, float] = {}
    phase_stages: dict[str, list] = {}
    seen_ids: set[int] = set()
    if stages:
        seen_ids = set(_stage_snapshot(spark))  # exclude warmup stages

    def timed(name, thunk):
        t0 = time.time()
        out = thunk()
        t[name] = round(time.time() - t0, 2)
        if stages:
            snap = _stage_snapshot(spark)
            new = sorted(set(snap) - seen_ids)
            seen_ids.update(new)
            phase_stages[name] = [dict(snap[i], stage=i) for i in new]
        return out

    files = spark.read.parquet(path)
    records = timed(
        "normalize+pin",
        lambda: normalize.normalize(files, cfg).localCheckpoint(eager=True),
    )

    # mirror run_pipeline exactly: the uniqueness probe and the winner
    # side run as CONCURRENT driver actions over the pin. Large inputs
    # (partition-count proxy, cfg.fused_reps_min_partitions) pin the
    # fat reps rows INSIDE the probe window as one fused job — the
    # "reps+pin" phase then reports 0.0 because that materialization no
    # longer exists as a separate sequential step; small inputs keep
    # the thin winner pin + lazy broadcast reps.
    from concurrent.futures import ThreadPoolExecutor

    fused_reps = records.rdd.getNumPartitions() >= cfg.fused_reps_min_partitions

    def _probe_and_winner_side():
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_probe = pool.submit(
                lambda: normalize.uniqueness_stats(records, with_contents=False)
            )
            f_side = pool.submit(
                lambda: (
                    normalize.representatives(records)
                    if fused_reps
                    else normalize.winner_ids(records)
                ).localCheckpoint(eager=True)
            )
            probe, s = f_probe.result(), f_side.result()
            return (probe[0], probe[1], s.count()), s

    (n_rows, n_ids, n_contents), side = timed(
        "uniqueness_probe", _probe_and_winner_side
    )
    assert n_rows == n_ids, "scaling corpus has unique ids by construction"
    if fused_reps:
        reps = side
        winners = reps.select("content_sha", "record_id")
        t["reps+pin"] = 0.0
    elif n_rows <= cfg.broadcast_sides_max_records:
        winners = side
        reps = timed(
            "reps+pin",
            lambda: normalize.representatives_from_winners(
                records, winners, broadcast=True
            ),
        )
    else:
        winners = side
        reps = timed(
            "reps+pin",
            lambda: normalize.representatives_from_winners(
                records, winners
            ).localCheckpoint(eager=True),
        )
    ex_edges = normalize.exact_edges(records, winners=winners)

    def _sides():
        idf = idf_map(reps, n_contents, cfg)
        return scoring.side_features_onepass(reps, idf, cfg).localCheckpoint(eager=True)

    sides = timed("sides(idf+features)+pin", _sides)

    def _score():
        sigs = sides.select("record_id", "sig")
        blocks = blocking.all_blocks(reps, sigs, cfg)
        pairs = blocking.candidate_pairs(blocks, cfg)
        return scoring.score_pairs_onepass(
            pairs, sides, cfg, n_records=n_rows
        ).localCheckpoint(eager=True)

    scored = timed("pairs+joins+score+pin", _score)

    cc_stats: dict = {}

    def _cc():
        edges = (
            rank.threshold_edges(scored, cfg)
            .select("left_id", "right_id", "pass_name")
            .unionByName(ex_edges.select("left_id", "right_id", "pass_name"))
        )
        return cluster.connected_components(
            edges, all_nodes=records.select("record_id"), cfg=cfg,
            nodes_unique=True, edges_unique=True, stats_out=cc_stats,
        )

    clusters = timed("edges+cc", _cc)

    def _counts():
        # materialize the cluster table end-to-end (noop sink)
        # CONCURRENTLY with the pair count over the pinned scored
        # table, and take the cluster count from the union-find
        # aggregates when the driver path ran (mirrors
        # bench.run_er_pipeline)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_pairs = pool.submit(scored.count)
            f_mat = pool.submit(
                lambda: clusters.write.format("noop").mode("overwrite").save()
            )
            n_pairs = f_pairs.result()
            f_mat.result()
        if cc_stats.get("driver_path"):
            n_cl = cc_stats["n_edge_roots"] + (n_rows - cc_stats["n_edge_nodes"])
        else:
            n_cl = clusters.agg(F.countDistinct("cluster_id")).collect()[0][0]
        return n_pairs, n_cl

    n_pairs, n_clusters = timed("counts", _counts)
    total = round(sum(t.values()), 2)
    out = {
        "cpus": cpus, "phases": t, "total": total,
        "records": n_rows, "pairs": n_pairs, "clusters": n_clusters,
    }
    if stages:
        out["phase_stages"] = phase_stages
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n-base", type=int, default=200_000)
    ap.add_argument("--both", action="store_true")
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--cooldown", type=int, default=45)
    ap.add_argument("--stages", action="store_true",
                    help="attribute completed Spark stages (exec time, "
                         "shuffle bytes) to each phase via the UI REST API")
    args = ap.parse_args()

    if not args.both:
        print(json.dumps(run_phases(args.cpus, args.n_base, stages=args.stages)))
        return

    results = {}
    for cpus in (args.lo, args.hi):
        if results:
            time.sleep(args.cooldown)
        env = dict(os.environ)
        env.setdefault("AMP_DRIVER_MEM", "16g")
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            env.setdefault("AMP_LOCAL_DIR", "/dev/shm/amp_spark_local")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cpus", str(cpus), "--n-base", str(args.n_base)]
            + (["--stages"] if args.stages else []),
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(
                f"phase run at cpus={cpus} failed (rc={out.returncode}); "
                "stderr above"
            )
        results[cpus] = json.loads(lines[-1])

    lo, hi = results[args.lo], results[args.hi]
    factor = args.hi / args.lo
    print(f"\n| phase | local[{args.lo}] s | local[{args.hi}] s | {factor:.0f}x efficiency |")
    print("|---|---|---|---|")
    for p in PHASES:
        a, b = lo["phases"][p], hi["phases"][p]
        eff = a / (factor * b) if b > 0 else float("nan")
        print(f"| {p} | {a} | {b} | {eff:.2f} |")
    eff_total = lo["total"] / (factor * hi["total"])
    print(f"| TOTAL | {lo['total']} | {hi['total']} | {eff_total:.2f} |")
    print(json.dumps({"lo": lo, "hi": hi, "efficiency_total": round(eff_total, 3)}))


if __name__ == "__main__":
    main()
