#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only_query ...]

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify,
runs the matching oracle_sql.json entry in DuckDB with the sfDir parquet
tables registered as views, and compares THE WAY THE DRIVER DOES:
pandas frames, columns sorted by name, rows sorted, values compared by
exact repr INCLUDING python type — so a Spark Decimal('103580.80')
column fails against DuckDB float64 103580.8 even though the numbers
match (that dtype gap cost 16 queries in round 1; the old %.10g
normalization here hid it).
"""
import json
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # sort rows via stringified key (robust to unhashable cells like
    # numpy arrays — the driver CRASHES on those, so flag them loudly)
    key = df.apply(lambda r: tuple(repr(v) for v in r), axis=1)
    df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def cell_repr(v):
    # Value repr, calibrated against the driver's observed round-1 gate:
    # Decimal('103580.80') vs float 103580.8 FAILS (reprs differ) and
    # int64 5 vs float64 5.0 FAILS, but datetime64[ns] vs [us] and
    # int32 vs int64 PASS (identical reprs) — exactly the driver's
    # behavior on the round-1 dumps.
    return repr(v)


def compare(name, spark_df, oracle_df):
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s, o = canon(spark_df), canon(oracle_df)
    if problems:
        return problems
    n = min(len(s), len(o))
    bad = 0
    for i in range(n):
        for c in s.columns:
            a, b = s[c].iloc[i], o[c].iloc[i]
            if cell_repr(a) != cell_repr(b) and not (pd.isna(a) and pd.isna(b)):
                problems.append(f"row {i} col {c}: spark={cell_repr(a)} oracle={cell_repr(b)}")
                bad += 1
                if bad >= 5:
                    return problems + ["... (truncated)"]
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # bound DuckDB and spill to disk: the sf0.1 sweeps' big CTE chains
    # (minhash sig pipelines) otherwise chase the default 80%-of-RAM
    # limit into allocator thrash and take the python process down with
    # them (malloc failures mid-sweep)
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '32GB')}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        dump = Path(out_dir) / name
        if not dump.exists():
            print(f"FAIL {name}: no spark dump")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(dump)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems[:8]:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
