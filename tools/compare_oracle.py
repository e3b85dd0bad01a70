#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Loads each `<verifyOutDir>/<name>` parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views over
`<sfDir>/*.parquet`, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact for ints/strings, tiny epsilon report for
floats so near-misses are visible).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if a is None or b is None:
            # pandas NaN handling
            af = isinstance(a, float) and math.isnan(a)
            bf = isinstance(b, float) and math.isnan(b)
            return (a is None or af) and (b is None or bf)
        if isinstance(a, float) or isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        return a == b
    except Exception:
        return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # The DuckDB oracles tokenize with ASCII-only regex classes while the
    # Spark engine uses full Unicode classes; equivalence holds only while
    # the corpus is pure ASCII. Guard that assumption explicitly.
    non_ascii = con.execute(
        r"SELECT count(*) FROM documents "
        r"WHERE regexp_matches(text, '[^\x00-\x7f]')").fetchone()[0]
    if non_ascii:
        print(f"WARN  {non_ascii} non-ASCII documents: tokenizer oracles "
              "(ASCII regex classes) are not trustworthy on this corpus")
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = 0
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cmp_cell(a, b):
                    if bad < 3:
                        print(f"  mismatch {name}.{c}[{i}]: spark={a!r} duckdb={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL  {name}: {bad} mismatched cells / {len(got)} rows")
            failures += 1
        else:
            print(f"OK    {name}: {len(got)} rows, {len(got.columns)} cols")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
