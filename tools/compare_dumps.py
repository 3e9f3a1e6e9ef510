#!/usr/bin/env python3
"""Bitwise A/B compare of two graft.Verify dumps (round 14).

Usage:
    python3 tools/compare_dumps.py DUMP_A_DIR DUMP_B_DIR

The execution-regime gates run Verify twice — once under default
session config and once under a forced regime (SPARK_GRAFT_OFFHEAP=1,
SPARK_GRAFT_SPILL=1) — and this tool asserts the two dumps are
VALUE-IDENTICAL per query: same schema (names + dtypes), same row
count, same cell values in the same order, exact float bits (NaN==NaN;
no rounding, no sorting — every oracle-backed entry ends in a total
ORDER BY, so row order is part of the contract).

Oracle-backed entries (those in oracle_sql.json) are hard-compared;
entries without an oracle (m* ML fits, sketch-rule rows-only) are
compared too but mismatches there are reported informationally — their
outputs may legitimately depend on partition layout, which is exactly
why they carry no oracle.

Exit 0 iff every oracle-backed entry matches (and the two dumps cover
the same query set).
"""
import json
import os
import sys


def read_parquet_dir(path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    tables = [pq.read_table(os.path.join(path, f)) for f in files]
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    return t.combine_chunks()


def diff_tables(a, b):
    """Return None if identical, else a short human-readable reason."""
    an = [f.name for f in a.schema]
    bn = [f.name for f in b.schema]
    if an != bn:
        return f"column names differ: {an} vs {bn}"
    at = [str(f.type) for f in a.schema]
    bt = [str(f.type) for f in b.schema]
    if at != bt:
        return f"column types differ: {at} vs {bt}"
    if a.num_rows != b.num_rows:
        return f"row counts differ: {a.num_rows} vs {b.num_rows}"
    if a.equals(b):   # fast path: exact arrow equality (bitwise, NaN!=NaN)
        return None
    # slow path: arrow's equals treats NaN as unequal — re-check per cell
    # with NaN==NaN semantics so a float NaN column doesn't false-fail
    for name in an:
        ca, cb = a.column(name).to_pylist(), b.column(name).to_pylist()
        for i, (x, y) in enumerate(zip(ca, cb)):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float) \
                    and x != x and y != y:
                continue
            return f"column {name} row {i}: {x!r} vs {y!r}"
    return None


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    da, db = sys.argv[1], sys.argv[2]
    with open(os.path.join(da, "oracle_sql.json")) as f:
        oracle = set(json.load(f))
    qa = {d for d in os.listdir(da) if os.path.isdir(os.path.join(da, d))}
    qb = {d for d in os.listdir(db) if os.path.isdir(os.path.join(db, d))}
    rc = 0
    if qa != qb:
        print(f"FAIL dump coverage differs: only-in-A={sorted(qa - qb)} "
              f"only-in-B={sorted(qb - qa)}")
        rc = 1
    hard, info, ok = [], [], 0
    for name in sorted(qa & qb):
        try:
            reason = diff_tables(read_parquet_dir(os.path.join(da, name)),
                                 read_parquet_dir(os.path.join(db, name)))
        except Exception as e:
            reason = f"read failed: {e}"
        if reason is None:
            ok += 1
        elif name in oracle:
            hard.append(f"{name}: {reason}")
        else:
            info.append(f"{name}: {reason}")
    for h in hard:
        print("FAIL", h)
        rc = 1
    for i in info:
        print("info (no-oracle entry, layout-dependent by design):", i)
    n_oracle = len(oracle & qa & qb)
    print(f"{ok}/{len(qa & qb)} entries bit-identical "
          f"({n_oracle} oracle-backed hard-compared, "
          f"{len(hard)} hard mismatches, {len(info)} informational)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
