#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: row count, column names (sorted), and
values (columns sorted by name, doubles rounded) — mirroring the
driver's hash compare as documented in the builder prompt.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    ok = fail = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        res = pq.read_table(str(Path(out_dir, name)))
        cols = sorted(res.column_names)
        spark_rows = [tuple(norm(row[c]) for c in cols)
                      for row in res.to_pylist()]
        if name not in oracle:
            print(f"  {name}: rows-only ({len(spark_rows)} rows) "
                  f"{'OK' if spark_rows else 'EMPTY!'}")
            continue
        try:
            duck = con.execute(oracle[name])
            dcols = sorted(d[0] for d in duck.description)
            drows_raw = duck.fetchall()
            dnames = [d[0] for d in duck.description]
            idx = [dnames.index(c) for c in dcols]
            duck_rows = [tuple(norm(r[i]) for i in idx) for r in drows_raw]
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            fail += 1
            continue
        if cols != dcols:
            print(f"  {name}: COLUMN MISMATCH spark={cols} duck={dcols}")
            fail += 1
        elif spark_rows != duck_rows:
            print(f"  {name}: VALUE MISMATCH "
                  f"({len(spark_rows)} vs {len(duck_rows)} rows)")
            for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                if a != b:
                    print(f"    first diff row {i}: spark={a} duck={b}")
                    break
            else:
                if len(spark_rows) != len(duck_rows):
                    print("    (row count differs)")
            fail += 1
        else:
            print(f"  {name}: OK ({len(spark_rows)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
