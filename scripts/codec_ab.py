"""Shuffle/IO codec A/B (VERDICT r3 next #3): lz4 (default) vs zstd.

The E(2→8) residual in BENCH/FIXED_COST.md is bandwidth-shaped; zstd
trades CPU for shuffle bytes, so if shuffle-byte bandwidth is a real
component of the residual, zstd should shift wall time at the
bandwidth-starved levels (local[2] most, local[8] some, local[32] least).

Runs bench.py (BENCH_DIAG=0) with ZENTITY_IO_CODEC set, steal-gated and
core-pinned exactly like scripts/scaling.py, accumulating into
BENCH/codec_ab.json keyed (sf, cpus, codec).  The lz4 arm can reuse the
scaling store's cells (same engine fingerprint, same protocol) — pass
--reuse-lz4 to skip measuring lz4 where scaling_results.json already has
clean runs at the current fingerprint.

Usage:
    python scripts/codec_ab.py --sf-dir /root/testdata/sf0.1 \
        --levels 2,8 --codecs lz4,zstd --runs 2 --clean-runs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import (REPO, engine_fingerprint, load_store,  # noqa: E402
                     measure_level)

AB_STORE = os.path.join(REPO, "BENCH", "codec_ab.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--codecs", default="lz4,zstd")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--clean-runs", type=int, default=2)
    ap.add_argument("--max-tries", type=int, default=4)
    ap.add_argument("--steal-thr", type=float, default=3.0)
    ap.add_argument("--reuse-lz4", action="store_true",
                    help="seed the lz4 arm from BENCH/scaling_results.json "
                         "cells measured at the current engine fingerprint")
    args = ap.parse_args()

    sf = os.path.basename(os.path.normpath(args.sf_dir))
    fp = engine_fingerprint()
    store = {}
    if os.path.exists(AB_STORE):
        with open(AB_STORE) as f:
            store = json.load(f)

    scaling_store = load_store()
    for cpus_s in args.levels.split(","):
        cpus = int(cpus_s)
        shuffle = 4 * cpus
        for codec in args.codecs.split(","):
            key = f"{cpus}/{codec}"
            prior = store.get(sf, {}).get(key)
            seed = (prior["all_runs"]
                    if prior and prior.get("engine_fp") == fp else None)
            if seed is None and codec == "lz4" and args.reuse_lz4:
                cell = scaling_store.get(sf, {}).get(str(cpus))
                if cell and cell.get("engine_fp") == fp:
                    seed = cell["all_runs"]
            clean_seeded = sum(
                1 for w, s in (seed or [])
                if s is not None and s <= args.steal_thr)
            if clean_seeded >= args.clean_runs:
                print(f"{sf} local[{cpus}] {codec}: {clean_seeded} clean "
                      f"seeded runs — skipping", flush=True)
                if key not in store.get(sf, {}):
                    clean = [w for w, s in seed
                             if s is not None and s <= args.steal_thr]
                    store.setdefault(sf, {})[key] = {
                        "wall_s": min(clean), "all_runs": seed,
                        "n_clean": clean_seeded, "engine_fp": fp,
                        "codec": codec, "source": "scaling_results.json"}
                continue
            os.environ["ZENTITY_IO_CODEC"] = codec
            try:
                r = measure_level(args.sf_dir, cpus, shuffle, args.runs,
                                  args.steal_thr, args.clean_runs,
                                  args.max_tries, seed_walls=seed)
            finally:
                del os.environ["ZENTITY_IO_CODEC"]
            r["engine_fp"] = fp
            r["codec"] = codec
            store.setdefault(sf, {})[key] = r
            print(f"{sf} local[{cpus}] {codec}: min-clean={r['wall_s']}s "
                  f"({r['n_clean']} clean)", flush=True)
            with open(AB_STORE, "w") as f:
                json.dump(store, f, indent=1)

    with open(AB_STORE, "w") as f:
        json.dump(store, f, indent=1)
    # summary table
    print("\n| sf | cpus | lz4 s | zstd s | zstd/lz4 |")
    print("|---|---|---|---|---|")
    for sf_k, cells in store.items():
        by_cpu: dict[int, dict[str, float]] = {}
        for key, r in cells.items():
            c, codec = key.split("/")
            by_cpu.setdefault(int(c), {})[codec] = r["wall_s"]
        for c in sorted(by_cpu):
            lz, zs = by_cpu[c].get("lz4"), by_cpu[c].get("zstd")
            if lz and zs:
                print(f"| {sf_k} | {c} | {lz:.2f} | {zs:.2f} "
                      f"| {zs / lz:.3f} |")


if __name__ == "__main__":
    main()
