"""Where does the pairs+joins+score wall go at hi parallelism?

Builds the pipeline up to the pinned sides table (exactly as
scripts/phase_scaling.py does), then repeats the scoring phase N times
in ONE JVM, snapshotting the Spark UI stage timeline each repeat.
Prints per repeat: wall, time covered by at-least-one-running-stage
(union of [submission, completion] intervals), driver gap (wall minus
covered), and the first-submission latency. Driver gap ~= serial
planning/AQE/job-submission time that parallelism cannot shrink.
"""

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PROBE_CPUS", "8"))
REPEATS = int(os.environ.get("PROBE_REPEATS", "3"))

from bench import _corpus_path, _warmup
from amp import blocking, normalize, scoring
from amp.config import DEFAULT_CONFIG as cfg
from amp.features import idf_map
from amp.session import get_spark, shuffle_partitions_for

spark = get_spark(
    "probe-pairs", cpus=CPUS,
    shuffle_partitions=shuffle_partitions_for(CPUS, 200_000),
    extra_conf={"spark.ui.enabled": "true"},
)
path = _corpus_path(spark, 200_000)
_warmup(spark)

files = spark.read.parquet(path)
records = normalize.normalize(files, cfg).localCheckpoint(eager=True)
n_rows = records.count()
reps = normalize.representatives(records).localCheckpoint(eager=True)
idf = idf_map(reps, n_rows, cfg)
sides = scoring.side_features_onepass(reps, idf, cfg).localCheckpoint(eager=True)
sides.count()


def stages_snapshot():
    from bench import completed_stages

    return completed_stages(spark)


def ts(s):
    # "2026-08-18T03:20:00.123GMT"
    return datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


for rep in range(REPEATS):
    before_ids = {s["stageId"] for s in stages_snapshot()}
    t0 = time.time()
    sigs = sides.select("record_id", "sig")
    blocks = blocking.all_blocks(reps, sigs, cfg)
    pairs = blocking.candidate_pairs(blocks, cfg)
    scored = scoring.score_pairs_onepass(
        pairs, sides, cfg, n_records=n_rows
    ).localCheckpoint(eager=True)
    wall = time.time() - t0
    # snapshot BEFORE count(): count's stage must not inflate `covered`
    # past the wall window (would drive driver_gap negative)
    new = [s for s in stages_snapshot() if s["stageId"] not in before_ids]
    n = scored.count()
    iv = sorted(
        (ts(s["submissionTime"]), ts(s["completionTime"]))
        for s in new
        if "submissionTime" in s and "completionTime" in s
    )
    merged = []
    for a, b in iv:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    covered = sum(b - a for a, b in merged)
    first_lat = iv[0][0] - t0 if iv else None
    inter_gaps = [
        round(merged[i + 1][0] - merged[i][1], 2)
        for i in range(len(merged) - 1)
    ]
    print(json.dumps({
        "rep": rep, "wall": round(wall, 2), "pairs": n,
        "stages": len(new), "covered": round(covered, 2),
        "driver_gap": round(wall - covered, 2),
        "first_submission_latency": (
            round(first_lat, 2) if first_lat is not None else None
        ),
        "inter_stage_gaps": inter_gaps,
        "per_stage": [
            {
                "id": s["stageId"], "tasks": s.get("numCompleteTasks"),
                "wall": round(ts(s["completionTime"]) - ts(s["submissionTime"]), 2),
                "exec": round(s.get("executorRunTime", 0) / 1000.0, 1),
                "name": s.get("name", "")[:40],
            }
            for s in sorted(new, key=lambda s: s["stageId"])
        ],
    }), flush=True)
    time.sleep(5)
