"""Round-5 task 3: executor-seconds accounting for the four driver-bench
risers (pair_tfidf_dot, tfidf_postings, rank_window, text_quality in
BENCH_r04 vs r03).

Walls on this host carry a documented bimodal multiplier; executor
run time is the noise-robust column (BENCH/BASELINE.md). This harness
runs ONLY the riser queries against an arbitrary checkout (--repo), so
the round-3 code (a git worktree at its end commit) and HEAD can be
interleaved at the same window under the same JVM settings as the
driver bench (local[32], shuffle=32, sf0.1).

    python scripts/riser_ab.py --repo /root/repo --repeats 3
    python scripts/riser_ab.py --repo /tmp/amp_r3 --repeats 3

Per query: untimed warmup run, then `repeats` timed runs; exec_sec is
the delta of total executor run time across all completed stages
(Spark UI REST API) around each timed run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

RISERS = ["pair_tfidf_dot", "tfidf_postings", "rank_window", "text_quality"]


def _exec_sec_total(spark) -> float:
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("executorRunTime", 0) for s in stages) / 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    sys.path.insert(0, repo)
    os.chdir(repo)

    from amp.session import get_spark
    import __spark_entry__ as E
    from bench import _warmup

    spark = get_spark(
        "riser-ab", cpus=args.cpus, shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    _warmup(spark)
    qs = E.queries()

    out: dict[str, dict] = {}
    for name in RISERS:
        # untimed warmup of this query's own kernels/plans
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        walls, execs = [], []
        for _ in range(args.repeats):
            e0 = _exec_sec_total(spark)
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
            execs.append(round(_exec_sec_total(spark) - e0, 2))
        out[name] = {"walls": walls, "exec_secs": execs}
    print(json.dumps({"repo": repo, "cpus": args.cpus, "risers": out}))


if __name__ == "__main__":
    main()
