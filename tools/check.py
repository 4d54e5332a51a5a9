#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the shipped
library). Runs DuckDB on every oracle in outDir/oracle_sql.json against the
testdata tables, loads the matching Spark parquet result, and compares
sorted rows/columns exactly.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import duckdb, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql)
            ecols = sorted(exp.columns)
            erows = sorted(map(tuple, exp.df()[ecols].map(norm).itertuples(index=False)))
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            gcols = sorted(got.columns)
            grows = sorted(map(tuple, got.df()[gcols].map(norm).itertuples(index=False)))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if ecols != gcols:
            print(f"FAIL {name}: cols oracle={ecols} spark={gcols}")
            n_fail += 1
        elif erows != grows:
            diffs = [(a, b) for a, b in zip(erows, grows) if a != b]
            print(f"FAIL {name}: {len(erows)} vs {len(grows)} rows, "
                  f"{len(diffs)} mismatched; first: "
                  f"{diffs[0] if diffs else (erows[-1], grows[-1] if grows else None)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
