#!/usr/bin/env python3
"""Gram-band config A/B at the composite-key level (VERDICT r4 wrong #1).

The r4 5-band length-scaled scheme cut per-key heat but grew key VOLUME
+33% at sf0.01, and key volume multiplies through the per-resolver
composite cross (a doc's name-keys × dob-keys), making pairs/edges the
regressed stages.  This script renders the engine's own keys → ck →
capped-pair SQL for DuckDB under several _GRAM_BANDS candidates and
reports, per config:

  key_rows      total blocking-key rows (the +33% metric)
  ck_rows       Σ composite-key rows over resolvers (pairs-stage input)
  pair_mass     Σ_ckey C(min(n,cap),2) over resolvers (pairs-stage work)
  edges         verified match-edge count (recall invariant — MUST be
                identical across configs; the band lemma says any lev≤k
                pair shares ≥1 band)

Usage: python scripts/band_ab.py [corpus.parquet]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zentity_spark import dialect as D                     # noqa: E402
from zentity_spark.model import Model                      # noqa: E402
from zentity_spark.pipeline import DEFAULT_SCOPE           # noqa: E402
from zentity_spark.plans import compiler                   # noqa: E402
from zentity_spark.plans.compiler import compile_model     # noqa: E402

CONFIGS = {
    # round-4 shipped scheme (the regression under test)
    "r4_5band": ((2, 6, 8), (3, 7, 11), (4, 10, 14), (5, 13, 17),
                 (6, 16, None)),
    # r3's band CUTS with r4's sentinel padding (2 bands, seam at {9,10})
    "pad_2band": ((2, 6, 10), (3, 9, None)),
    # 3-band candidates: keep 4-grams for long values, vary the f3/f4 seam
    "3band_s11": ((2, 6, 8), (3, 7, 12), (4, 11, None)),
    "3band_s12": ((2, 6, 8), (3, 7, 13), (4, 12, None)),
    "3band_s14": ((2, 6, 8), (3, 7, 15), (4, 14, None)),
}


def check_lemma(bands) -> None:
    """Every k=2-eligible min-length m >= 6 must have a band with
    [m, m+2] ⊆ [lo, hi] and lo >= 3n-2 (padded count filter)."""
    for n, lo, hi in bands:
        assert lo >= 3 * n - 2, (n, lo)
    for m in range(6, 64):
        ok = any(lo <= m and (hi is None or m + 2 <= hi)
                 for n, lo, hi in bands)
        assert ok, f"coverage hole at min-len {m}: {bands}"


def measure(corpus: str, name: str, bands) -> dict:
    check_lemma(bands)
    old = compiler._GRAM_BANDS
    compiler._GRAM_BANDS = bands
    try:
        model = Model.parse(open(os.path.join(
            REPO, "fixtures", "model_person.json")).read())
        plan = compile_model(model, DEFAULT_SCOPE)
        con = duckdb.connect()
        rel = f"read_parquet('{corpus}')"
        t0 = time.time()
        keys_sql = plan.sql(D.DUCKDB, rel,
                            "SELECT doc_id, attr, key FROM keys_x",
                            upto="keys_x")
        con.execute(f"CREATE TEMP TABLE k AS {keys_sql}")
        key_rows = con.execute("SELECT count(*) FROM k").fetchone()[0]
        ck_rows = pair_mass = 0
        cap = plan.block_cap
        for r in plan.active_resolvers():
            ck_sql = plan.sql_resolver_ck(r, D.DUCKDB).replace("keys_x", "k")
            row = con.execute(
                f"SELECT count(*), coalesce(sum("
                f"least(n, {cap}) * (least(n, {cap}) - 1) // 2), 0) "
                f"FROM (SELECT count(*) AS n FROM ({ck_sql}) "
                f"GROUP BY ckey)").fetchone()
            ck_rows += row[0]
            pair_mass += int(row[1])
        edges_sql = plan.sql(D.DUCKDB, rel,
                             "SELECT count(*) AS n FROM match_edges_x",
                             upto="match_edges_x")
        edges = con.execute(edges_sql).fetchone()[0]
        wall = time.time() - t0
        con.close()
        return dict(name=name, key_rows=key_rows, ck_rows=ck_rows,
                    pair_mass=pair_mass, edges=edges, wall=round(wall, 1))
    finally:
        compiler._GRAM_BANDS = old


def main() -> None:
    corpus = (sys.argv[1] if len(sys.argv) > 1 else
              os.path.join(REPO, "fixtures", "sf0.01", "docs_spans.parquet"))
    print(f"corpus: {corpus}")
    print(f"{'config':>10} {'key_rows':>10} {'ck_rows':>10} "
          f"{'pair_mass':>12} {'edges':>8} {'wall_s':>7}")
    for name, bands in CONFIGS.items():
        r = measure(corpus, name, bands)
        print(f"{r['name']:>10} {r['key_rows']:>10,} {r['ck_rows']:>10,} "
              f"{r['pair_mass']:>12,} {r['edges']:>8,} {r['wall']:>7}")


if __name__ == "__main__":
    main()
