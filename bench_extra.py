"""Round-6 measurement sidecar (bench.py is FROZEN for the driver's
measurement — this file carries the extra instrumentation the
optimization guide §1 asks for: per-query noop-sink isolation on any
subset of the declared queries, repeat medians, and .explain("formatted")
capture for the plans/ evidence directory).

Session setup matches bench.py exactly (same get_spark, same
shuffle-partition policy, same env contract), so numbers here are
comparable to the driver's harness.

Usage:
  python bench_extra.py --sf-dir /tmp/sf1 [--queries a,b,c] [--repeats N]
  python bench_extra.py --sf-dir /tmp/sf1 --explain-dir plans/r06 --suffix after
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    if "AMP_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        os.environ["AMP_LOCAL_DIR"] = "/dev/shm/amp_spark_local"
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: bench.py picks)")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain-dir", default=None,
                    help="write <query>_<suffix>.txt explain files here")
    ap.add_argument("--suffix", default="after")
    args = ap.parse_args()

    import __spark_entry__ as E
    from amp.session import get_spark, shuffle_partitions_for
    from bench import _er_scale, _sf_of, _warmup

    sf = _sf_of(args.sf_dir)
    n_base = _er_scale(sf)
    spark = get_spark(
        "amp-bench-extra",
        cpus=args.cpus,
        shuffle_partitions=shuffle_partitions_for(args.cpus, n_base),
    )
    _warmup(spark)
    qs = E.queries()
    picks = (
        args.queries.split(",")
        if args.queries
        else [
            "block_pairs_multipass", "tfidf_postings", "pair_tfidf_dot",
            "rank_window", "dedup_minhash_lsh", "dedup_simhash",
            "dedup_embedding_cosine", "dedup_embedding_lsh",
            "ann_bruteforce_topk", "ann_ivf_topk",
            "match_provided_embedding_topk", "text_quality",
            "text_fingerprints", "agg_lineitem", "join_orders_customer",
            "star_shipping_priority", "star_local_supplier_volume",
            "window_events_topk",
        ]
    )
    times: dict[str, list[float]] = {p: [] for p in picks}
    for rep in range(args.repeats):
        for name in picks:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in picks:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
    med = {p: statistics.median(v) for p, v in times.items()}
    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": args.cpus, "repeats": args.repeats,
        "median": med, "samples": times,
        "total_median": round(sum(med.values()), 3),
    }))


if __name__ == "__main__":
    main()
