#!/usr/bin/env python3
"""Storage-device evidence: the anti-scaling shared resource under the bench.

scripts/membw.py showed this box's DRAM is NOT the binding ceiling
(aggregate copy bandwidth scales near-linearly to p=16, ~200 GiB/s, and
E_bw(4->16) ~= 0.84).  This script measures the other shared byte path —
the single virtio disk (/dev/vda) behind spark.local.dir, the parquet
warehouse, and every localCheckpoint:

  part 1 (`--dd`): aggregate fdatasync write bandwidth at p parallel
  writers.  Measured on this box (3 tries, max-over-tries): 356 / 436 /
  485 MiB/s at p = 1 / 2 / 4, FALLING to 363 at p=8 and 332 at p=16
  (E_io(4->16) = 0.17), with large try-to-try variance (the co-tenant
  shares the device: p=4 spans 167-485 MiB/s across tries) — the device
  not only fails to scale with writers, it actively degrades under
  concurrency (cloud-volume throttling), i.e. byte-heavy phases lose
  absolute bandwidth as parallelism rises.

  part 2 (`--bench`): wraps one bench.py process with /sys/block/vda/stat
  deltas: bytes written/read, device-busy ms (io_ticks) vs wall.  A sync +
  dirty-page drain after the run attributes lazy writeback to the run that
  produced it.  Reported: device bytes per run, average write rate, and
  busy fraction — if device-busy approaches wall while CPUs idle, the
  residual F in BENCH/FIXED_COST.md's T(p) = F + W/p fit is the disk.

Results -> BENCH/iobw.json.  Protocol notes: steal%% recorded around each
arm; page-cache reads make re-reads nearly free, so written bytes dominate.

Usage:
  python scripts/iobw.py --dd
  python scripts/iobw.py --bench --sf-dir /root/testdata/sf0.1 --cpus 8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "iobw.json")
DEV = "/sys/block/vda/stat"


def dev_sample() -> dict:
    with open(DEV) as f:
        v = [int(x) for x in f.read().split()]
    return {"rd_sect": v[2], "wr_sect": v[6], "io_ms": v[9],
            "rd_ms": v[3], "wr_ms": v[7]}


def steal_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def cpu_sample() -> tuple[int, int]:
    """(busy_ticks, iowait_ticks) across all vCPUs: user+nice+system."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[4]


def drain_writeback(timeout: float = 120.0) -> None:
    subprocess.run(["sync"], check=False)
    t0 = time.time()
    while time.time() - t0 < timeout:
        with open("/proc/meminfo") as f:
            mem = dict(ln.split(":")[:2] for ln in f
                       if ":" in ln)  # value strings keep " kB"
        dirty = int(mem.get("Dirty", "0 kB").split()[0])
        wb = int(mem.get("Writeback", "0 kB").split()[0])
        if dirty + wb < 51_200:  # < 50 MiB outstanding
            return
        time.sleep(1)


def run_dd(store: dict) -> None:
    d = os.path.expanduser("~/.zentity_spark_local/iobw_dd")
    os.makedirs(d, exist_ok=True)
    rows = []
    for p in (1, 2, 4, 8, 16):
        s0 = steal_sample()
        t0 = time.time()
        procs = [subprocess.Popen(
            ["dd", "if=/dev/zero", f"of={d}/f{i}", "bs=1M", "count=1024",
             "conv=fdatasync"], stderr=subprocess.DEVNULL)
            for i in range(p)]
        for pr in procs:
            pr.wait()
        dt = time.time() - t0
        s1 = steal_sample()
        steal = 100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1])
        rows.append({"writers": p, "agg_mibs": round(p * 1024 / dt, 1),
                     "wall_s": round(dt, 1), "steal_pct": round(steal, 2)})
        print(rows[-1], flush=True)
        for f in glob.glob(f"{d}/f*"):
            os.remove(f)
    store.setdefault("dd_write_scaling", []).append(rows)


def run_bench_instrumented(store: dict, sf_dir: str, cpus: int,
                           repeat: int) -> None:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SHUFFLE=str(4 * cpus),
               BENCH_REPEAT=str(repeat),
               BENCH_DIAG="0",
               ZENTITY_DRIVER_MEM="32g")
    drain_writeback()  # start from a quiesced device
    d0, s0, c0 = dev_sample(), steal_sample(), cpu_sample()
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py exited {p.returncode}")
    c1 = cpu_sample()  # CPU sampled BEFORE the drain (drain is not the job)
    drain_writeback()  # attribute lazy writeback to this run
    d1, s1 = dev_sample(), steal_sample()
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    r = json.loads(line)
    wr_mib = (d1["wr_sect"] - d0["wr_sect"]) * 512 / 2**20
    rd_mib = (d1["rd_sect"] - d0["rd_sect"]) * 512 / 2**20
    busy_s = (d1["io_ms"] - d0["io_ms"]) / 1000.0
    steal = 100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1])
    cell = {
        "sf_dir": sf_dir, "cpus": cpus, "repeat": repeat,
        "bench_runs_s": r["runs"], "bench_steal_pct": r.get("steal_pct"),
        "proc_wall_s": round(wall, 1),
        "dev_written_mib": round(wr_mib, 1),
        "dev_read_mib": round(rd_mib, 1),
        "dev_busy_s": round(busy_s, 1),
        "dev_busy_frac_of_proc": round(busy_s / wall, 3),
        "written_mib_per_run": round(wr_mib / max(1, repeat), 1),
        "outer_steal_pct": round(steal, 2),
        # avg busy vCPUs over the bench process (user+nice+sys, whole VM;
        # 100 ticks/s) — utilization vs the local[N] budget
        "busy_cores_avg": round((c1[0] - c0[0]) / 100.0 / wall, 2),
        "iowait_cores_avg": round((c1[1] - c0[1]) / 100.0 / wall, 2),
    }
    store.setdefault("bench_io", []).append(cell)
    print(json.dumps(cell, indent=1), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dd", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    store: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            store = json.load(f)

    if args.dd:
        run_dd(store)
    if args.bench:
        run_bench_instrumented(store, args.sf_dir, args.cpus, args.repeat)

    with open(OUT, "w") as f:
        json.dump(store, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
