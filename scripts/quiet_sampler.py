"""Load-gated scaling sampler.

The sandbox host is bimodal (ambient load 0-5 from neighbors; see
BENCH/BASELINE.md measurement notes). Rather than running fixed-time
sets that straddle both host phases, this sampler WAITS for a quiet
1-minute loadavg before each sample, then runs one interleaved
lo/hi pair (fresh subprocess JVM each, same corpus, same flags as
bench.py --scaling) and appends a JSON line per pair with the load
observed immediately before each leg. Pooling and quiet-band
selection happen offline from the log - no sample is ever dropped at
collection time.

    python scripts/quiet_sampler.py --pairs 6 --max-load 0.7 \
        --out /tmp/r5_samples.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def wait_quiet(max_load: float, timeout_s: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if load1() < max_load:
            return True
        time.sleep(30)
    return False


def run_one(cpus: int, n_base: int) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--cpus", str(cpus), "--er-base", str(n_base),
        "--er-only", "--json-only", "--stage-metrics",
    ]
    env = dict(os.environ)
    env.setdefault("AMP_DRIVER_MEM", "16g")
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        env.setdefault("AMP_LOCAL_DIR", "/dev/shm/amp_spark_local")
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        # a failed leg must not kill the multi-hour collection run —
        # record it and keep sampling
        return {"error": (out.stderr or out.stdout or "no output")[-500:]}
    r = json.loads(lines[-1])
    return {
        "wall": r["queries"]["er_pipeline"],
        "exec_sec": r.get("stage_totals", {}).get("total_exec_sec"),
        "pairs": r["er_pairs_scored"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--n-base", type=int, default=200_000)
    ap.add_argument("--max-load", type=float, default=0.7)
    ap.add_argument("--wait-timeout", type=float, default=3600)
    ap.add_argument("--cooldown", type=int, default=60)
    ap.add_argument("--out", default="/tmp/quiet_samples.jsonl")
    args = ap.parse_args()

    for i in range(args.pairs):
        rec: dict = {"pair": i, "ts": time.time()}
        for level, cpus in (("lo", args.lo), ("hi", args.hi)):
            if not wait_quiet(args.max_load, args.wait_timeout):
                rec[f"{level}_skipped"] = "no quiet window in timeout"
                break
            rec[f"{level}_load_before"] = load1()
            r = run_one(cpus, args.n_base)
            if "error" in r:
                rec[f"{level}_error"] = r["error"]
                time.sleep(args.cooldown)
                break
            rec[f"{level}_wall"] = r["wall"]
            rec[f"{level}_exec_sec"] = r["exec_sec"]
            rec[f"{level}_load_after"] = load1()
            time.sleep(args.cooldown)
        if "lo_wall" in rec and "hi_wall" in rec:
            rec["pair_efficiency"] = round(
                rec["lo_wall"] / rec["hi_wall"] / (args.hi / args.lo), 3
            )
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
