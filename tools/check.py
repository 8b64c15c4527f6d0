#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (as the driver does), and compares
values exactly. Reports per-query PASS/FAIL with a diff preview.

Driver-side tooling only — NOT part of the Spark library.
"""
import datetime as dtm
import json
import math
import struct
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_key(t):
    """Canonical Arrow-type label. Strict on width/kind (int64 vs
    decimal128 — the HUGEINT failure mode the lenient checker missed for
    two rounds) but representation-neutral where the driver is: tz-ness
    of microsecond timestamps and string offset width.
    """
    if pa.types.is_timestamp(t):
        # Spark writes INT96 (ns in Arrow), DuckDB yields us — resolution
        # and tz-ness are representation-neutral to the driver's hash
        return "timestamp"
    # integer WIDTH is representation-neutral to the driver (q81's int32
    # row_number hashes equal to DuckDB's int64), and so is decimal-vs-
    # float (q56's SUM(decimal) passed r6) — but decimal-vs-INT is the
    # HUGEINT failure mode the driver rejects (q136/q190/q195), which
    # this mapping preserves: decimal joins the float class, not int
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t) or pa.types.is_floating(t):
        return "double"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{t.field(i).name}: {type_key(t.field(i).type)}"
                          for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)


def norm(v, exact_decimal=False):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical IEEE-754 bytes — distinguishes -0.0 from 0.0, as the
        # driver's bit-strict hash does
        return struct.pack(">d", v).hex()
    if isinstance(v, Decimal):
        if exact_decimal:
            # BOTH sides are decimal for this column: compare the exact
            # value (normalize() strips trailing zeros so scale drift is
            # representation-neutral) — routing through float() would
            # equate decimals differing beyond 53 bits and overflow
            # decimal128(38) magnitudes to inf, making this checker more
            # lenient than the driver's bit-strict hash
            return "dec:" + str(v.normalize())
        # decimal-vs-float column: float() IS the driver's comparison
        # class (q56's SUM(decimal) vs DOUBLE passed r6); NEVER compare
        # Decimal to float directly — Python converts the float exactly
        # and Decimal("52.1") != 52.1
        return norm(float(v))
    if isinstance(v, dtm.datetime):
        # Spark INT96 reads back tz-aware UTC, DuckDB naive — driver
        # hashes the instant, not the tz flag. Rebuild as a PLAIN
        # datetime: pandas.Timestamp subclasses datetime with a different
        # repr, which would break the repr-keyed row sort.
        if v.tzinfo is not None:
            v = v.astimezone(dtm.timezone.utc)
        return dtm.datetime(v.year, v.month, v.day, v.hour, v.minute,
                            v.second, v.microsecond)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def rows_of(tbl, exact_dec=None):
    # sort columns by name, rows by all values — driver order.
    # exact_dec: per-sorted-column flags — True where BOTH engines
    # produced a decimal, switching that column to exact-value compare.
    names = tbl.column_names
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [tbl.column(i).to_pylist() for i in order]
    types = [type_key(tbl.schema.field(i).type) for i in order]
    if exact_dec is None:
        exact_dec = [False] * len(order)
    rows = [tuple(norm(c[r], exact_dec[j]) for j, c in enumerate(cols))
            for r in range(len(cols[0]) if cols else 0)]
    # repr gives a total order even with NULLs / mixed types in a column
    # (the driver's hash is row-order-INSENSITIVE — verified over r7's
    # 198 greens — so the primary compare sorts; see the ordered-compare
    # warning in main() for queries whose oracle ends in ORDER BY)
    return sorted(names), types, rows, sorted(rows, key=repr)


def both_decimal_flags(t1, t2):
    """Per sorted-column-position flags: True where both schemas carry a
    decimal type (→ exact compare instead of the float class)."""
    def sorted_types(t):
        names = t.column_names
        order = sorted(range(len(names)), key=lambda i: names[i])
        return [t.schema.field(i).type for i in order]
    a, b = sorted_types(t1), sorted_types(t2)
    n = min(len(a), len(b))
    return [pa.types.is_decimal(a[i]) and pa.types.is_decimal(b[i])
            for i in range(n)] + [False] * (len(a) - n)


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
        if name not in oracle:
            n_noracle += 1
            print(f"  ROWS-ONLY {name}: {tbl.num_rows} rows (no oracle)")
            continue
        try:
            d_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            n_fail += 1
            print(f"✗ FAIL {name}: oracle SQL error: {e}")
            continue
        flags = both_decimal_flags(tbl, d_tbl)
        sn, st, sordered, srows = rows_of(tbl, flags)
        dn, dt, dordered, drows = rows_of(d_tbl, flags)
        if sn != dn:
            n_fail += 1
            print(f"✗ FAIL {name}: column names differ spark={sn} duck={dn}")
            continue
        if st != dt:
            n_fail += 1
            print(f"✗ FAIL {name}: column TYPES differ (cols={sn})")
            print(f"    spark: {st}")
            print(f"    duck:  {dt}")
            continue
        if srows == drows:
            n_pass += 1
            # soft ORDER BY check: the driver hashes order-insensitively,
            # but a divergent output order under a trailing ORDER BY is
            # worth a warning (ties aside, it usually means a missing
            # sort key)
            tail = oracle[name].rstrip()[-300:].upper()
            if "ORDER BY" in tail and sordered != dordered:
                print(f"✓ PASS {name} ({len(srows)} rows) "
                      f"[WARN: row ORDER differs under trailing ORDER BY]")
            else:
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
