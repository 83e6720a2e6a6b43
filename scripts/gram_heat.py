#!/usr/bin/env python3
"""Gram-key heat by key class — the measurement behind BENCH/GRAM_HEAT.md.

Renders the engine's own keys stage (`keys_x`, the er_blocking_keys
driver query) for DuckDB against a fixture corpus and aggregates by key
class (the prefix the key scheme embeds: x/d/e1/f2/f3/f4/f5/p/...),
reporting key rows, row share, hottest key, and pair mass
sum(C(docs,2)) per class.  Usage:

  python scripts/gram_heat.py [fixtures/sf0.01/docs_spans.parquet ...]

Defaults to the sf0.01 fixture (GRAM_HEAT.md's corpus) and the
on-demand .cache/sf0.1 corpus if present — the ~100x contrast that tests
GRAM_HEAT.md's scale read (per-key heat grows ~linearly with corpus
size; shares stay put).
"""
from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zentity_spark import dialect as D                     # noqa: E402
from zentity_spark.model import Model                      # noqa: E402
from zentity_spark.pipeline import DEFAULT_SCOPE           # noqa: E402
from zentity_spark.plans.compiler import compile_model     # noqa: E402


def measure(corpus: str) -> None:
    model = Model.parse(open(os.path.join(
        REPO, "fixtures", "model_person.json")).read())
    plan = compile_model(model, DEFAULT_SCOPE)
    keys_sql = plan.sql(D.DUCKDB, f"read_parquet('{corpus}')",
                        "SELECT doc_id, attr, key FROM keys_x",
                        upto="keys_x")
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}')").fetchone()[0]
    rows = con.execute(f"""
        WITH k AS ({keys_sql}),
        per_key AS (
          SELECT CASE WHEN position(':' IN key) > 0
                      THEN substr(key, 1, position(':' IN key) - 1)
                      ELSE '?' END AS class,
                 key, count(DISTINCT doc_id) AS docs, count(*) AS rws
          FROM k GROUP BY 1, 2)
        SELECT class, count(*) AS keys, sum(rws) AS key_rows,
               max(docs) AS hottest,
               sum(docs * (docs - 1) // 2) AS pair_mass
        FROM per_key GROUP BY class ORDER BY key_rows DESC""").fetchall()
    total = sum(r[2] for r in rows)
    print(f"\n== {corpus} ({n_docs} docs, {total} key rows) ==")
    print(f"{'class':>8} {'keys':>9} {'key rows':>10} {'share':>7} "
          f"{'hottest':>8} {'hot %docs':>9} {'pair mass':>12}")
    for cl, keys, krows, hot, pm in rows:
        print(f"{cl:>8} {keys:>9,} {krows:>10,} {krows/total:>6.1%} "
              f"{hot:>8,} {hot/n_docs:>8.2%} {int(pm):>12,}")


def main() -> None:
    args = sys.argv[1:] or [
        os.path.join(REPO, "fixtures", "sf0.01", "docs_spans.parquet"),
        os.path.join(REPO, ".cache", "sf0.1", "docs_spans.parquet"),
    ]
    for corpus in args:
        if os.path.exists(corpus):
            measure(corpus)
        else:
            print(f"skip (missing): {corpus}")


if __name__ == "__main__":
    main()
