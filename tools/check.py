#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (as the driver does), and compares
values exactly. Reports per-query PASS/FAIL with a diff preview.

Driver-side tooling only — NOT part of the Spark library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cols, names):
    # sort columns by name, rows by all values
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    rows = [tuple(norm(c[r]) for c in cols) for r in range(len(cols[0]) if cols else 0)]
    return sorted(names), rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())

    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        tbl = pq.read_table(str(qdir))
        s_names = tbl.column_names
        s_cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        if name not in oracle:
            n_noracle += 1
            print(f"  ROWS-ONLY {name}: {tbl.num_rows} rows (no oracle)")
            continue
        try:
            res = con.execute(oracle[name])
            d_names = [d[0] for d in res.description]
            d_tbl = res.fetch_arrow_table()
            d_cols = [d_tbl.column(i).to_pylist() for i in range(d_tbl.num_columns)]
        except Exception as e:
            n_fail += 1
            print(f"✗ FAIL {name}: oracle SQL error: {e}")
            continue
        sn, srows = rows_of(s_cols, s_names)
        dn, drows = rows_of(d_cols, d_names)
        if sn != dn:
            n_fail += 1
            print(f"✗ FAIL {name}: column names differ spark={sn} duck={dn}")
            continue
        if srows == drows:
            n_pass += 1
            print(f"✓ PASS {name} ({len(srows)} rows)")
        else:
            n_fail += 1
            print(f"✗ FAIL {name}: spark {len(srows)} rows vs duck {len(drows)} rows; cols={sn}")
            only_s = [r for r in srows if r not in set(drows)][:3]
            only_d = [r for r in drows if r not in set(srows)][:3]
            for r in only_s:
                print(f"    spark-only: {r}")
            for r in only_d:
                print(f"    duck-only:  {r}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
