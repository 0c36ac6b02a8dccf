#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT part of the
engine). Runs Verify's parquet outputs against the DuckDB oracle SQL and
reports per-query row/schema/value diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # driver semantics: sort columns by name, then compare value multisets
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_bad += 1
            continue
        es = sorted(tuple(norm(r[i]) for i in ei) for r in exp)
        gs = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        if es != gs:
            n_bad += 1
            diff = [(a, b) for a, b in zip(es, gs) if a != b][:3]
            extra = abs(len(es) - len(gs))
            print(f"FAIL {name}: rows exp={len(es)} got={len(gs)} "
                  f"first-diffs={diff} (+{extra} len diff)")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(es)} rows)")
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
