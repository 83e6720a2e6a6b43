#!/usr/bin/env python3
"""Disjoint-core interference A/B: is the non-scaling residual DRAM bandwidth?

BENCH/FIXED_COST.md argues the missed E >= 0.8 target is the single socket's
shared-DRAM bandwidth (flat F-per-doc across tiers; codec A/B sign pattern).
This script adds the most direct causal test the sandbox allows: pin the
bench to cores 0-3 and co-run, on DISJOINT cores 8-11, either

  - arm "spin":   4 pure-compute spinners (tiny working set, L1/L2-resident
                  -> no DRAM traffic)          [control: shared-core effects]
  - arm "memhog": 4 streaming numpy copiers (256 MiB src->dst each ->
                  saturating DRAM traffic)     [treatment]
  - arm "solo":   nothing                      [baseline]

Cores are disjoint (32 physical cores, no SMT, 1 socket / 1 NUMA node —
lscpu), and neither co-runner touches disk, so wall(memhog) >> wall(solo)
~= wall(spin) can only be the shared memory subsystem — exactly the
resource a real 4N-executor cluster multiplies and this box cannot.

Protocol matches scripts/scaling.py: whole-JVM taskset, per-run steal%
gating (co-runner CPU is NOT steal — steal is hypervisor-level), drop run 0
(JIT warmup), min over clean runs, arms interleaved across tries so
co-tenant noise decorrelates from the arm. Results ->
BENCH/interference_ab.json.

Usage: python scripts/interference_ab.py [--sf-dir DIR] [--tries N]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "interference_ab.json")

BENCH_CORES = "0-3"
CO_CORES = [8, 9, 10, 11]
STEAL_THR = 3.0

SPIN_SRC = (
    "x = 1.0000001\n"
    "while True:\n"
    "    x = (x * 1.0000001) % 9.7\n"
)
MEMHOG_SRC = (
    "import numpy as np\n"
    "src = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB\n"
    "dst = np.empty_like(src)\n"
    "while True:\n"
    "    np.copyto(dst, src)\n"
    "    np.copyto(src, dst)\n"
)


def start_corunners(kind: str) -> list[subprocess.Popen]:
    if kind == "solo":
        return []
    src = SPIN_SRC if kind == "spin" else MEMHOG_SRC
    procs = []
    for core in CO_CORES:
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c", src],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    time.sleep(2)  # let the hogs reach steady state before the bench starts
    return procs


def stop_corunners(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait()


def run_bench(sf_dir: str, repeat: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_SHUFFLE="16",
               BENCH_REPEAT=str(repeat),
               BENCH_DIAG="0",
               ZENTITY_DRIVER_MEM="32g")
    p = subprocess.run(
        ["taskset", "-c", BENCH_CORES, sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py exited {p.returncode}")
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tries", type=int, default=2,
                    help="bench processes per arm (each: 1 warmup + "
                         "--repeat measured runs)")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    store: dict = {"sf_dir": args.sf_dir, "bench_cores": BENCH_CORES,
                   "co_cores": CO_CORES, "arms": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
        if prior.get("sf_dir") == args.sf_dir:
            store = prior

    arms = ["solo", "spin", "memhog"]
    for t in range(args.tries):
        for arm in arms:  # interleave arms across tries
            procs = start_corunners(arm)
            try:
                r = run_bench(args.sf_dir, args.repeat + 1)
            except RuntimeError as exc:
                print(f"{arm} try {t}: bench died ({exc}) — dirty try",
                      flush=True)
                continue
            finally:
                stop_corunners(procs)
            runs = list(zip(r["runs"],
                            r.get("steal_pct") or [None] * len(r["runs"])))
            runs = runs[1:]  # drop JIT warmup
            cell = store["arms"].setdefault(arm, {"all_runs": []})
            cell["all_runs"].extend(runs)
            clean = [w for w, s in cell["all_runs"]
                     if s is not None and s <= STEAL_THR]
            cell["n_clean"] = len(clean)
            cell["wall_s"] = min(clean) if clean else None
            cell["docs"] = r.get("docs")
            print(f"{arm} try {t}: runs={runs} clean={len(clean)} "
                  f"min={cell['wall_s']}", flush=True)
            with open(OUT, "w") as f:
                json.dump(store, f, indent=1)

    solo = store["arms"].get("solo", {}).get("wall_s")
    for arm in ("spin", "memhog"):
        w = store["arms"].get(arm, {}).get("wall_s")
        if solo and w:
            print(f"{arm}: wall {w:.1f}s vs solo {solo:.1f}s -> "
                  f"slowdown {w / solo:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
