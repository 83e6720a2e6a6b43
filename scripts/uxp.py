#!/usr/bin/env python3
"""Recompute the E = U x P factorization from BENCH/iobw.json bench_io cells.

For each (sf_dir, cpus) cell, the min-of-clean try (bench steal <= 3%)
is selected; U and P for a (p, 4p) pair are computed from that try's
wall and whole-VM busy-core average (see BENCH/FIXED_COST.md section 3):

    E = T_low / T_high / 4
    U = (busy_high / p_high) / (busy_low / p_low)
    P = (T_low * busy_low) / (T_high * busy_high)     # U * P == E

Prints a markdown table ready to paste into FIXED_COST.md section 3b.
"""
from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEAL_CLEAN = 3.0


def cells() -> dict:
    store = json.load(open(os.path.join(REPO, "BENCH", "iobw.json")))
    best: dict[tuple, dict] = {}
    stats: dict[tuple, dict] = {}
    for e in store["bench_io"]:
        if e.get("busy_cores_avg") is None:
            continue
        key = (e["sf_dir"].rstrip("/").split("/")[-1], e["cpus"])
        t = min(e["bench_runs_s"])
        steal = max(e.get("bench_steal_pct") or [99.0])
        st = stats.setdefault(key, {"n": 0, "n_clean": 0, "walls": []})
        st["n"] += 1
        if steal <= STEAL_CLEAN:
            st["n_clean"] += 1
            st["walls"].append(t)
            if key not in best or t < min(best[key]["bench_runs_s"]):
                best[key] = e
    return {k: {"cell": v, **stats[k]} for k, v in best.items()}


def main() -> None:
    c = cells()
    pairs = [("sf1", 4, 16), ("sf0.3", 4, 16), ("sf0.1", 4, 16),
             ("sf1", 8, 32), ("sf0.1", 2, 8)]
    print("| pair | T_low | busy_low | T_high | busy_high | E | U | P "
          "| fill_low | fill_high | n_clean (lo/hi) |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for sf, pl, ph in pairs:
        lo, hi = c.get((sf, pl)), c.get((sf, ph))
        if not lo or not hi:
            print(f"| {sf} ({pl},{ph}) | — missing cell — |")
            continue
        Tl, Th = min(lo["cell"]["bench_runs_s"]), min(hi["cell"]["bench_runs_s"])
        bl, bh = lo["cell"]["busy_cores_avg"], hi["cell"]["busy_cores_avg"]
        E, U = Tl / Th / (ph / pl), (bh / ph) / (bl / pl)
        P = (Tl * bl) / (Th * bh)
        print(f"| {sf} ({pl},{ph}) | {Tl:.1f} s | {bl:.2f} | {Th:.1f} s "
              f"| {bh:.2f} | {E:.3f} | {U:.3f} | {P:.3f} "
              f"| {bl/pl:.2f} | {bh/ph:.2f} "
              f"| {lo['n_clean']}/{hi['n_clean']} |")
    print()
    print("all clean-try combinations per pair (mean [min,max]):")
    import statistics as st
    raw: dict[tuple, list] = {}
    store = json.load(open(os.path.join(REPO, "BENCH", "iobw.json")))
    for e in store["bench_io"]:
        if e.get("busy_cores_avg") is None:
            continue
        if max(e.get("bench_steal_pct") or [99.0]) > STEAL_CLEAN:
            continue
        key = (e["sf_dir"].rstrip("/").split("/")[-1], e["cpus"])
        raw.setdefault(key, []).append(
            (min(e["bench_runs_s"]), e["busy_cores_avg"]))
    for sf, pl, ph in pairs:
        lo, hi = raw.get((sf, pl)), raw.get((sf, ph))
        if not lo or not hi:
            continue
        es, us, ps = [], [], []
        for Tl, bl in lo:
            for Th, bh in hi:
                es.append(Tl / Th / (ph / pl))
                us.append((bh / ph) / (bl / pl))
                ps.append((Tl * bl) / (Th * bh))
        print(f"  {sf} ({pl},{ph}): "
              f"E {st.mean(es):.3f} [{min(es):.3f},{max(es):.3f}]  "
              f"U {st.mean(us):.3f} [{min(us):.3f},{max(us):.3f}]  "
              f"P {st.mean(ps):.3f} [{min(ps):.3f},{max(ps):.3f}]  "
              f"(n={len(es)} combos)")
    print()
    print("fill by budget (min-of-clean cells):")
    for (sf, p), v in sorted(c.items()):
        e = v["cell"]
        t = min(e["bench_runs_s"])
        spread = (f"{min(v['walls']):.1f}-{max(v['walls']):.1f}"
                  if len(v["walls"]) > 1 else f"{t:.1f}")
        print(f"  {sf} p={p}: wall {spread} s (n_clean={v['n_clean']}/"
              f"{v['n']}), busy/p = {e['busy_cores_avg']/p:.2f}")


if __name__ == "__main__":
    main()
