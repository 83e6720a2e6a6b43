#!/usr/bin/env python3
"""MinHash production-tier candidate scaling across testdata tiers.

Measures, per documents tier (DuckDB render of the same dual-dialect
SQL the driver queries run):
  - verified near-dup pair density at the prod verify threshold
    (tau = 0.2) — the TRUE structure the op must find;
  - raw candidate volume from the banding (K=128, b=64, r=2) and its
    estimated-jaccard distribution — what the S-curve actually admits.

Findings land in BENCH/MINHASH_SCALE.md.  Usage:
  python scripts/minhash_scale.py [sf0.01 sf0.1 ...]
"""
from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zentity_spark import tdops                 # noqa: E402
from zentity_spark import dialect as D          # noqa: E402

TAU = 0.2
BIN_SQL = ("CASE WHEN jaccard < 0.05 THEN 'j<0.05' "
           "WHEN jaccard < 0.10 THEN '0.05<=j<0.10' "
           "WHEN jaccard < 0.20 THEN '0.10<=j<0.20' "
           "ELSE 'j>=0.20' END")


def measure(sf: str, tier: str = "prod") -> dict:
    """tier 'prod' = (K=128, b=64, r=2, w=3); tier 'lowbg' = the shipped
    remedy (K=864, b=288, r=3, w=5) — td_minhash_lowbg_pairs."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'/root/testdata/{sf}/documents.parquet')")
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    if tier == "prod":
        k, bands, w = (tdops.MINHASH_K_PROD, tdops.MINHASH_BANDS_PROD, 3)
    else:
        k, bands, w = (tdops.MINHASH_K_LOWBG, tdops.MINHASH_BANDS_LOWBG,
                       tdops.MINHASH_SHINGLE_W_LOWBG)
    pairs_sql = tdops.sql_minhash_pairs(
        "documents", D.DUCKDB, k=k, bands=bands, tau=0.0, shingle_w=w)
    bins = dict(con.execute(
        f"WITH o AS ({pairs_sql}) SELECT {BIN_SQL}, count(*) "
        "FROM o GROUP BY 1").fetchall())
    cand = sum(bins.values())
    ver = bins.get("j>=0.20", 0)
    row = {"sf": sf, "tier": tier, "docs": n, "cand_pairs": cand,
           "cand_per_doc": round(cand / n, 3),
           "verified_pairs_tau": ver,
           "verified_per_doc": round(ver / n, 4),
           "cand_precision_at_tau": round(ver / cand, 4) if cand else None,
           "cand_jaccard_bins": bins}
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.01", "sf0.1"]
    rows = [measure(sf, t) for sf in tiers for t in ("prod", "lowbg")]
    with open(os.path.join(REPO, "BENCH", "minhash_scale.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
