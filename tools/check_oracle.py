#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify,
runs the matching oracle_sql.json entry in DuckDB with the sfDir parquet
tables registered as views, and compares (schema-insensitively):
columns sorted by name, rows sorted, values stringified with float
normalization. Prints PASS/FAIL per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    named = sorted(cols)
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return named, out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        dump = Path(out_dir) / name
        if not dump.exists():
            print(f"FAIL {name}: no spark dump")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{dump}/*.parquet'")
        gc, gr = frame_key(got.columns, got.fetchall())
        try:
            exp = con.sql(sql)
            ec, er = frame_key(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr + [None], er + [None])) if a != b)
            print(f"FAIL {name}: rows differ ({len(gr)} vs {len(er)}); first diff @{bad}:")
            print(f"  spark: {gr[bad] if bad < len(gr) else '<missing>'}")
            print(f"  duck : {er[bad] if bad < len(er) else '<missing>'}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    # rows-only checks for queries without oracle
    for dump in sorted(Path(out_dir).iterdir()):
        if dump.is_dir() and dump.name not in oracles:
            n = con.sql(f"SELECT count(*) FROM '{dump}/*.parquet'").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {dump.name} (rows-only: {n} rows)")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
