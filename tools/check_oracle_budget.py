#!/usr/bin/env python3
"""check_oracle with a per-entry wall-clock budget: entries whose DuckDB
oracle exceeds the budget are SKIPPED (named), not failed — for salvaging
a full-catalog sf0.1 pass on a slow container where the handful of
all-pairs oracles would run for hours (they are verified separately)."""
import json, sys, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
        if ours_cols != ref_cols:
            failures.append((name, f"columns differ: {ours_cols} vs {ref_cols}")); continue
        n_o = len(ours[ours_cols[0]]) if ours_cols else 0
        n_r = len(ref[ref_cols[0]]) if ref_cols else 0
        if n_o != n_r:
            failures.append((name, f"row count {n_o} vs {n_r}")); continue
        bad = None
        for c in ours_cols:
            for i, (a, b) in enumerate(zip(ours[c], ref[c])):
                ea = str(a) if not isinstance(a, float) else a
                eb = str(b) if not isinstance(b, float) else b
                if isinstance(a, float) and isinstance(b, float):
                    if not (a == b or (a != a and b != b)):
                        bad = f"{c}[{i}]: {a} vs {b}"; break
                elif ea != eb:
                    bad = f"{c}[{i}]: {a!r} vs {b!r}"; break
            if bad: break
        if bad: failures.append((name, bad))
        else:
            ok += 1; print(f"  OK   {name} ({n_o} rows)", flush=True)
    print(f"\n{ok} matched, {len(skipped)} skipped over budget: {','.join(skipped)}")
    if failures:
        for n, m in failures: print(f"  FAIL {n}: {m}")
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
