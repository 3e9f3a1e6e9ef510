#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB over the same fixture tables, and compares: row count,
column names, and values (exact equality; float diffs are reported with
their magnitude to aid debugging, but any mismatch fails).

Values are compared via fetchall() (native Python objects: Decimal for
DECIMAL, int for BIGINT, float for DOUBLE), NOT fetchdf() — pandas coerces
DECIMAL and nullable BIGINT to float64, which silently passes any decimal
divergence above 2^53 that the driver's exact value-hash would fail.
Decimals compare by canonical string, so a scale mismatch (5 vs 5.0) fails.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb


def fetch_named(cursor):
    """Execute result -> (sorted col names, {col: [values]}) with exact types."""
    cols = [d[0] for d in cursor.description]
    rows = cursor.fetchall()
    data = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    return sorted(cols), data

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(ours_cols, ours, ref_cols, ref):
    """Single comparison rule for BOTH gates (check_oracle and
    check_oracle_budget import this): column-name set, row count, then
    positional values — NULL==NaN, floats exact, everything else by
    canonical string (so Decimal scale mismatches fail). Returns None
    on match, else a diagnostic string."""
    if ours_cols != ref_cols:
        return f"columns differ: {ours_cols} vs {ref_cols}"
    n_ours = len(ours[ours_cols[0]]) if ours_cols else 0
    n_ref = len(ref[ref_cols[0]]) if ref_cols else 0
    if n_ours != n_ref:
        return f"row count {n_ours} vs {n_ref}"
    for c in ours_cols:
        for i, (x, y) in enumerate(zip(ours[c], ref[c])):
            if x is None and y is None:
                continue
            xna = x is None or (isinstance(x, float) and math.isnan(x))
            yna = y is None or (isinstance(y, float) and math.isnan(y))
            if xna and yna:
                continue
            if xna != yna:
                return f"col {c} row {i}: {x!r} vs {y!r} (null mismatch)"
            if isinstance(x, float) or isinstance(y, float):
                if x != y:
                    diff = abs(float(x) - float(y))
                    return f"col {c} row {i}: {x!r} vs {y!r} (diff {diff:g})"
            elif str(x) != str(y):
                return f"col {c} row {i}: {x!r} vs {y!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            ours_cols, ours = fetch_named(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            ref_cols, ref = fetch_named(con.execute(sql))
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        # driver sorts columns by name then hashes values; we compare
        # positionally (both sides carry the same total ORDER BY)
        bad = compare(ours_cols, ours, ref_cols, ref)
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK   {name} ({len(ours[ours_cols[0]]) if ours_cols else 0} rows)")
    print()
    if failures:
        for name, why in failures:
            print(f"  FAIL {name}: {why}")
        print(f"\n{len(failures)}/{len(oracle)} FAILED")
        sys.exit(1)
    print(f"all {len(oracle)} queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
