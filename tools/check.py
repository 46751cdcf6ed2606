#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against the sfDir parquet
tables, loads the corresponding Spark parquet dump, and compares as
order-insensitive multisets with float rounding. Exit 0 iff all match.
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.4f}"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)


def rows_to_multiset(cols, rows):
    # sort columns by name (driver behavior), then canonicalize values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            failures.append((name, "no spark output"))
            continue
        st = pq.read_table(spark_dir)
        s_cols = st.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in st.to_pylist()]
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}"))
            continue
        sm = rows_to_multiset(s_cols, s_rows)
        dm = rows_to_multiset(d_cols, d_rows)
        if len(sm) != len(dm):
            failures.append((name, f"rowcount: spark={len(sm)} duck={len(dm)}"))
            continue
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            continue
        print(f"OK   {name} ({len(sm)} rows)")
    # queries without oracle = rows-only
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracle:
            try:
                n = pq.read_table(d).num_rows
                print(f"ROWS {name} ({n} rows){' — EMPTY!' if n == 0 else ''}")
            except Exception as e:
                failures.append((name, f"unreadable spark output: {e}"))
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
