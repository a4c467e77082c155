#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev loop only; not
part of the shipped library). Usage:

    python3 tools/oracle_check.py <sfDir> <outDir>

Reads each Spark result parquet under <outDir>/<name>/, runs the matching
SQL from <outDir>/oracle_sql.json in DuckDB over the <sfDir> tables, and
compares: column-name sets, dtypes, and fully-sorted cell values (exact;
floats reported with their max abs diff when unequal).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"  {name:28s} ROWS-ONLY rows={len(spark_df)}")
            if len(spark_df) == 0:
                failures += 1
                print("      !! empty result")
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            failures += 1
            print(f"  {name:28s} !! oracle SQL error: {str(e)[:200]}")
            continue
        a, b = norm(spark_df), norm(oracle_df)
        problems = []
        if list(a.columns) != list(b.columns):
            problems.append(f"columns spark={list(a.columns)} oracle={list(b.columns)}")
        elif len(a) != len(b):
            problems.append(f"rowcount spark={len(a)} oracle={len(b)}")
        else:
            for c in a.columns:
                if str(a[c].dtype) != str(b[c].dtype):
                    problems.append(f"dtype[{c}] spark={a[c].dtype} oracle={b[c].dtype}")
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f':
                    neq = ~((av == bv) | (av.isna() & bv.isna()))
                    if neq.any():
                        d = (av[neq] - bv[neq]).abs().max()
                        problems.append(f"values[{c}] {int(neq.sum())} cells differ, maxabs={d}")
                else:
                    try:
                        neq = ~((av == bv) | (av.isna() & bv.isna()))
                    except Exception:
                        neq = av.astype(str) != bv.astype(str)
                    if neq.any():
                        i = int(neq.idxmax())
                        problems.append(
                            f"values[{c}] {int(neq.sum())} cells differ, first@{i}: "
                            f"spark={av[i]!r} oracle={bv[i]!r}")
        if problems:
            failures += 1
            print(f"  {name:28s} !! MISMATCH rows={len(a)}")
            for p in problems[:6]:
                print(f"      {p}")
        else:
            print(f"  {name:28s} OK rows={len(a)}")
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        failures += 1
        print(f"  {m:28s} !! oracle SQL present but no spark result dir")
    # the status manifest catches what the dir scan cannot: a CRASHED
    # rows-only query has no dump dir AND no oracle entry (the r8
    # failure mode — crashed queries silently absent from all artifacts)
    status_path = os.path.join(out_dir, "verify_status.json")
    if os.path.exists(status_path):
        status = json.load(open(status_path))
        for name, st in sorted(status.items()):
            if st != "ok":
                failures += 1
                print(f"  {name:28s} !! crashed in Verify: {st[:160]}")
        unlisted = sorted(set(status) - set(names) -
                          {n for n, s in status.items() if s != "ok"})
        for m in unlisted:
            failures += 1
            print(f"  {m:28s} !! status ok but no result dir")
    print(f"{'FAIL' if failures else 'PASS'}: {len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
