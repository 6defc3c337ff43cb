#!/usr/bin/env python3
"""Oracle-SQL syntax lint (VERDICT r5 item 7).

Usage: python3 tools/oracle_lint.py <sfDir> <oracleSqlJson>

Round-trips every oracle statement through DuckDB EXPLAIN against
views over the given parquet tables. EXPLAIN parses, binds names and
types, and plans — without executing — so a refactor that breaks an
oracle's syntax or column references fails HERE (and in the spec that
runs this) instead of surfacing as a driver `err` at round end.
Exit 0 = every statement plans; nonzero lists the broken ones.
"""
import json, sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
from check import TABLES  # ONE fixture-table list, not a drifting copy


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(oracle_path).read_text())
    fail = 0
    for name in sorted(oracle):
        try:
            con.execute("EXPLAIN " + oracle[name])
        except Exception as e:
            print(f"  {name}: ORACLE LINT FAIL: {e}")
            fail += 1
    print(f"== {len(oracle) - fail} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
