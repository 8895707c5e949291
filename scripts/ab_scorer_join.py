"""Ad-hoc A/B: scorer join strategy (broadcast sides vs shuffled-hash).

Times ONLY the pair-gen -> double-join -> Arrow-scorer phase over the
280k-record scaling corpus, both strategies alternating inside one JVM
(removes host bimodality from the comparison). Usage:

    python scripts/ab_scorer_join.py --cpus 8 --repeats 3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n-base", type=int, default=200_000)
    args = ap.parse_args()

    from bench import _corpus_path, _warmup
    from amp import blocking, normalize, scoring
    from amp.config import DEFAULT_CONFIG as cfg
    from amp.features import idf_map
    from amp.session import get_spark

    spark = get_spark("ab-scorer", cpus=args.cpus, shuffle_partitions=args.cpus * 4)
    path = _corpus_path(spark, args.n_base)
    files = spark.read.parquet(path)
    records = normalize.normalize(files, cfg).localCheckpoint(eager=True)
    n_rows = records.count()
    reps = normalize.representatives(records).localCheckpoint(eager=True)
    n_contents = reps.count()
    idf = idf_map(reps, n_contents, cfg)
    sides = scoring.side_features_onepass(reps, idf, cfg).localCheckpoint(eager=True)
    sigs = sides.select("record_id", "sig")
    _warmup(spark)

    def run(n_records):
        blocks = blocking.all_blocks(reps, sigs, cfg)
        pairs = blocking.candidate_pairs(blocks, cfg)
        scored = scoring.score_pairs_onepass(pairs, sides, cfg, n_records=n_records)
        t0 = time.time()
        scored.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    walls = {"shuffle": [], "broadcast": []}
    for i in range(args.repeats):
        order = [("shuffle", None), ("broadcast", n_rows)]
        if i % 2:
            order.reverse()
        for name, n in order:
            walls[name].append(round(run(n), 2))
            print(f"[{args.cpus} cpus] {name}: {walls[name][-1]}s", flush=True)
    import statistics

    for name, w in walls.items():
        print(f"{name}: median {statistics.median(w):.2f}s  all={w}")


if __name__ == "__main__":
    main()
