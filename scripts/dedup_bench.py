#!/usr/bin/env python3
"""Incremental dedup fold vs batch re-dedup, measured.

The td sibling of scripts/incremental_bench.py: synthesize a
deterministic text corpus with planted near-dups (seed 42 — the same
synthesise-at-small-scale rule the interleaved corpus follows),
bootstrap a hash-split 99% into ``IncrementalDeduper`` state, then time
fold(1%) against a full-batch `sql_minhash_lowbg_pairs` over 100%.

The structural claim being evidenced: the fold's cost is the Δ shingle/
band derivation + the Δ-band probe + verification of candidate docs
only, while batch cost grows with the corpus — so the ratio falls as N
grows, which is the operating mode a 100-TB corpus absorbing daily
increments needs.  Correctness of the fold is pinned elsewhere
(tests/test_dedup.py fold==batch; driver query td_increment_dedup).

Corpus shape: ~60-token docs of seeded random words; 5% of docs get a
near-dup twin (one token changed); 20% carry a shared 12-token
boilerplate prefix (the template-background regime — suppressed by the
lowbg tier's w=5 shingles, so candidates stay O(N)).

Results -> BENCH/dedup_bench.json.  Usage:
  python scripts/dedup_bench.py [N ...]    (default: 20000 100000)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zentity_spark import dialect as D, tdops           # noqa: E402
from zentity_spark.operators.dedup import IncrementalDeduper  # noqa: E402
from zentity_spark.session import get_spark             # noqa: E402

BOILER = " ".join(f"tmpl{i}" for i in range(12))


def synth_rows(n: int, seed: int = 42) -> list:
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    doc_id = 0
    while len(rows) < n:
        toks = [vocab[j] for j in rng.randint(0, len(vocab), 60)]
        text = " ".join(toks)
        if rng.rand() < 0.2:
            text = BOILER + " " + text
        rows.append((doc_id, text))
        doc_id += 1
        if rng.rand() < 0.05 and len(rows) < n:     # planted near-dup twin
            toks2 = list(toks)
            toks2[rng.randint(0, len(toks2))] = "edited"
            rows.append((doc_id, " ".join(toks2)))
            doc_id += 1
    return rows[:n]


def _steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def timed(fn):
    t0, (tot0, st0) = time.time(), _steal()
    out = fn()
    wall = time.time() - t0
    tot1, st1 = _steal()
    steal = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
    return out, round(wall, 2), round(steal, 1)


def _corpus(n: int, spark):
    rows = synth_rows(n)
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
                .repartition(32).cache()
    docs.count()
    base = docs.where("pmod(xxhash64(doc_id), 100) < 99")
    delta = docs.where("pmod(xxhash64(doc_id), 100) >= 99")
    return docs, base, delta


def measure(n: int, spark, phase: str = "all") -> dict:
    """phase 'all' | 'batch' | 'fold' — larger tiers split phases across
    processes so each invocation stays under the sandbox's ~20-min
    process killer; rows merge by n_docs in the store."""
    docs, base, delta = _corpus(n, spark)
    row: dict = {"n_docs": n}
    if phase in ("all", "batch"):
        docs.createOrReplaceTempView("_dd_bench")
        batch_sql = tdops.sql_minhash_lowbg_pairs("_dd_bench", D.SPARK)
        batch_pairs, batch_wall, batch_steal = timed(
            lambda: spark.sql(batch_sql).count())
        row |= {"batch_pairs": batch_pairs, "batch_wall_s": batch_wall,
                "batch_steal_pct": batch_steal}
    persist_state = os.path.join(REPO, ".cache", f"dedup_bench_{n}")
    if phase == "boot":
        # killer-safe split: bootstrap into a persistent state dir; a
        # later 'foldonly' invocation folds Δ against it
        shutil.rmtree(persist_state, ignore_errors=True)
        os.makedirs(persist_state, exist_ok=True)
        d = IncrementalDeduper(spark, persist_state)
        _, boot_wall, boot_steal = timed(lambda: d.fold(base).count())
        row |= {"bootstrap_wall_s": boot_wall,
                "bootstrap_steal_pct": boot_steal}
    if phase == "foldonly":
        row["n_delta"] = delta.count()
        d = IncrementalDeduper(spark, persist_state)
        new_pairs, fold_wall, fold_steal = timed(
            lambda: d.fold(delta).count())
        row |= {"total_pairs_after_fold": d.pairs().count(),
                "fold_wall_s": fold_wall, "fold_steal_pct": fold_steal,
                "delta_new_pairs": new_pairs}
        shutil.rmtree(persist_state, ignore_errors=True)
    if phase in ("all", "fold"):
        row["n_delta"] = delta.count()
        state = tempfile.mkdtemp(prefix="dedup_bench_")
        try:
            d = IncrementalDeduper(spark, state)
            _, boot_wall, boot_steal = timed(lambda: d.fold(base).count())
            new_pairs, fold_wall, fold_steal = timed(
                lambda: d.fold(delta).count())
            total_pairs = d.pairs().count()
        finally:
            shutil.rmtree(state, ignore_errors=True)
        row |= {"total_pairs_after_fold": total_pairs,
                "bootstrap_wall_s": boot_wall,
                "bootstrap_steal_pct": boot_steal,
                "fold_wall_s": fold_wall, "fold_steal_pct": fold_steal,
                "delta_new_pairs": new_pairs}
    docs.unpersist()
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    # one size per invocation is the killer-safe mode on this sandbox
    # (~20-min process cap); results MERGE into the store by n_docs
    specs = sys.argv[1:] or ["20000", "100000"]
    spark = get_spark(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    out = os.path.join(REPO, "BENCH", "dedup_bench.json")
    store = []
    if os.path.exists(out):
        with open(out) as f:
            store = json.load(f)
    for spec in specs:
        n, _, phase = spec.partition("@")
        n, phase = int(n), phase or "all"
        row = measure(n, spark, phase)
        prior = next((r for r in store if r["n_docs"] == n), {})
        row = prior | row
        if "batch_wall_s" in row and "fold_wall_s" in row:
            row["pairs_match"] = (row.get("batch_pairs")
                                  == row.get("total_pairs_after_fold"))
            row["fold_over_batch"] = round(
                row["fold_wall_s"] / row["batch_wall_s"], 3)
        store = [r for r in store if r["n_docs"] != n] + [row]
        store.sort(key=lambda r: r["n_docs"])
        with open(out, "w") as f:
            json.dump(store, f, indent=1)


if __name__ == "__main__":
    main()
