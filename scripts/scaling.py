"""Two-parallelism scaling protocol (BASELINE.md): run bench.py at
local[8] and local[32] on the same sf0.1 input, median of N runs each,
compute scaling efficiency E = r32 / (4 * r8), and write the results
table to BENCH/BASELINE.md.

This is the sandbox stand-in for the north rule's N vs 4N executors
criterion (no real cluster available — see BASELINE.md protocol notes).

Usage: python scripts/scaling.py [--runs 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, shuffle: int, repeat: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_SHUFFLE=str(shuffle),
               BENCH_REPEAT=str(repeat),
               BENCH_DIAG="0",
               ZENTITY_DRIVER_MEM="32g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3,
                    help="measured in-process repeats (plus 1 warmup)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    results = {}
    for cpus, shuffle in ((8, 32), (32, 128)):
        t0 = time.time()
        # one process per level, runs+1 in-process repeats; bench.py drops
        # run 0 (JIT warmup) and reports the median of the rest
        r = run_bench(args.sf_dir, cpus, shuffle, args.runs + 1)
        wall = r["value"]
        rate = r["docs"] / wall
        print(f"local[{cpus}] runs={r['runs']} median={wall}s "
              f"{rate:.1f} docs/s (total {time.time()-t0:.0f}s)", flush=True)
        results[cpus] = {
            "docs_per_sec": rate,
            "wall_s": wall,
            "docs": r["docs"],
            "runs": r,
        }

    r8 = results[8]["docs_per_sec"]
    r32 = results[32]["docs_per_sec"]
    eff = r32 / (4.0 * r8)

    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    table = f"""# BENCH results — two-parallelism scaling protocol

Input: sf0.1-equivalent interleaved corpus ({results[32]['docs']} docs,
FIXTURES.md seed=42); full pipeline extract → block → pair → verify →
cluster (cold, per-stage parquet materialization); median of {args.runs}
runs, first run discarded. Protocol: BASELINE.md.

| run | master | shuffle.partitions | docs/sec | wall s | E | commit |
|---|---|---|---|---|---|---|
| median | local[8] | 32 | {r8:.1f} | {results[8]['wall_s']:.2f} | — | {commit} |
| median | local[32] | 128 | {r32:.1f} | {results[32]['wall_s']:.2f} | {eff:.3f} | {commit} |

Scaling efficiency E = r32 / (4 x r8) = **{eff:.3f}** (target >= 0.8).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(table)
    print(table)
    print(json.dumps({"r8": r8, "r32": r32, "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
