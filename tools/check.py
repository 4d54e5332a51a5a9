#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the shipped
library). Runs DuckDB on every oracle in outDir/oracle_sql.json against the
testdata tables, loads the matching Spark parquet result, and compares
sorted rows/columns exactly — INCLUDING result column types.

The driver's hash is type/format-sensitive: a DuckDB HUGEINT (what
SUM(BIGINT) widens to) against a Spark BIGINT fails the driver even when
every value is equal. Earlier versions of this script compared through
pandas DataFrames, which silently coerce HUGEINT -> float64/int64 and
NULL-bearing int columns -> float64, so that class of mismatch PASSed
locally while failing the driver (round-3 pv1/wf1). This version:
  * compares `rel.types` per column (oracle vs the Spark parquet read),
  * fetches rows via fetchall() (native Python values, no pandas
    coercion), so a Decimal-vs-float or int-vs-float divergence that the
    DataFrame path would mask shows up as a type diff.
This is the local-gate contract: PASS here must predict hash_match=true.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import duckdb, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def sort_key(row):
    # None/mixed types aren't mutually comparable; key on (isNone, type, repr)
    # — deterministic and identical for equal multisets on both sides.
    return [(v is None, str(type(v)), str(v)) for v in row]


def cols_types_rows(rel):
    """(sorted cols, {col: type-str}, sorted rows projected in sorted-col order)."""
    cols = list(rel.columns)
    types = {c: str(t) for c, t in zip(cols, rel.types)}
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(norm(r[i]) for i in order) for r in rel.fetchall()),
        key=sort_key)
    return sorted(cols), types, rows


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
            ecols, etypes, erows = cols_types_rows(con.sql(sql))
            gcols, gtypes, grows = cols_types_rows(
                con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        tdiff = {c: (etypes.get(c), gtypes.get(c))
                 for c in set(etypes) | set(gtypes)
                 if etypes.get(c) != gtypes.get(c)}
        # The driver sorts results through pandas, which cannot hash
        # array/list cells ("unhashable type: numpy.ndarray" — round-5
        # em4/em5). Reject nested output types outright so a local PASS
        # keeps predicting hash_match=true.
        nested = {c: t for c, t in {**etypes, **gtypes}.items()
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))}
        if nested:
            print(f"FAIL {name}: nested output types (driver cannot hash): {nested}")
            n_fail += 1
        elif ecols != gcols:
            print(f"FAIL {name}: cols oracle={ecols} spark={gcols}")
            n_fail += 1
        elif tdiff:
            print(f"FAIL {name}: type mismatch (oracle, spark) per col: {tdiff}")
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
