#!/usr/bin/env python3
"""Seeded (query-time) resolution latency — cold vs warm stage cache.

The reference's operating mode is query-time resolution against a
prebuilt index; this engine's analog is seeded resolution against the
per-fingerprint stage cache: the FIRST query on a corpus pays stage
materialization (attrs/keys/vals), every later query probes the cached
parquet.  This script times that split at sf0.1 (600,332 docs,
local[32]): one cold input-seeded query, then three warm queries of
different seed kinds (ids / terms / doc-seeded snowball), per-query
steal sampled.  Results -> BENCH/seeded_bench.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return (v[7] if len(v) > 7 else 0), sum(v)


def timed(label: str, fn, out: list) -> None:
    s0, t0 = steal(), time.time()
    n = fn().count()
    wall = time.time() - t0
    s1 = steal()
    pct = 100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1])
    row = {"query": label, "wall_s": round(wall, 2),
           "steal_pct": round(pct, 2), "rows": n}
    out.append(row)
    print(json.dumps(row), flush=True)


def main() -> None:
    import __spark_entry__ as e
    from zentity_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]",
                      extra={"spark.sql.shuffle.partitions": str(4 * cpus)})
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows: list = []
    timed("input_seeded_cold", lambda: e._q_input_seeded(spark, sf_dir), rows)
    timed("input_seeded_warm", lambda: e._q_input_seeded(spark, sf_dir), rows)
    timed("ids_seeded_warm", lambda: e._q_ids_seeded(spark, sf_dir), rows)
    timed("terms_seeded_warm", lambda: e._q_terms_seeded(spark, sf_dir), rows)
    timed("doc_seeded_hops_warm", lambda: e._q_seeded(spark, sf_dir), rows)
    out = {"sf_dir": sf_dir, "cpus": cpus, "queries": rows}
    with open(os.path.join(REPO, "BENCH", "seeded_bench.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
