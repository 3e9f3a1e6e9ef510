#!/usr/bin/env python3
"""check_oracle with a per-entry wall-clock budget: entries whose DuckDB
oracle exceeds the budget are SKIPPED (named), not failed — for salvaging
a full-catalog sf0.1 pass on a slow container where the handful of
all-pairs oracles would run for hours (they are verified separately).

Value comparison is check_oracle.compare — ONE rule for both gates, so a
budget-skipped entry re-checked here can never get a different verdict
than the unbudgeted gate would give."""
import json, os, sys, threading
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, compare

def fetch_named(cur):
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return sorted(cols), {c: [r[i] for r in rows] for i, c in enumerate(cols)}

def main(sf_dir, out_dir, budget_s):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, skipped, ok = [], [], 0
    for name, sql in sorted(oracle.items()):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        try:
            ours_cols, ours = fetch_named(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}")); continue
        timer = threading.Timer(budget_s, con.interrupt)
        timer.start()
        try:
            ref_cols, ref = fetch_named(con.execute(sql))
        except Exception as e:
            timer.cancel()
            if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
                skipped.append(name); print(f"  SKIP {name} (budget {budget_s}s)", flush=True)
            else:
                failures.append((name, f"oracle SQL failed: {e}"))
            continue
        timer.cancel()
        bad = compare(ours_cols, ours, ref_cols, ref)
        if bad: failures.append((name, bad))
        else:
            n_o = len(ours[ours_cols[0]]) if ours_cols else 0
            ok += 1; print(f"  OK   {name} ({n_o} rows)", flush=True)
    print(f"\n{ok} matched, {len(skipped)} skipped over budget: {','.join(skipped)}")
    if failures:
        for n, m in failures: print(f"  FAIL {n}: {m}")
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
