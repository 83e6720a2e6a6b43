"""Local stand-in for the driver's correctness gate: run every
`__spark_entry__.queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB over the same parquet tables, then compare row count, column-name
set, and an order-insensitive value hash (columns sorted by name, rows
sorted by their stringified tuple — the driver's compare is
order-insensitive and name-keyed, so this catches the same mismatches).

Usage:
    python scripts/oracle_check.py [--sf-dir /root/testdata/sf0.01] [--only er_clusters,...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        return f"{val:.9g}"
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def value_hash(rows: list, cols: list) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to check")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from zentity_spark.session import get_spark

    spark = get_spark(master="local[8]", app="oracle_check",
                      shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = (args.only.split(",") if args.only else sorted(queries))
    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, args.sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}", flush=True)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})", flush=True)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL {name}: duckdb error: {exc}", flush=True)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh = value_hash([tuple(r) for r in srows], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}", flush=True)
        else:
            print(f"ok   {name} ({len(srows)} rows)", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
