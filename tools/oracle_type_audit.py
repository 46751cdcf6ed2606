#!/usr/bin/env python3
"""Cross-engine Arrow TYPE audit over a Verify dump.

Usage: python3 tools/oracle_type_audit.py <sfDir> <verifyOutDir>

schema_audit.py whitelists the SPARK dump's types; this tool closes the
other half of the round-16 pack_contiguous failure class: an oracle
whose DuckDB result exports through Arrow with a DIFFERENT type than
the Spark dump (the pack oracles' window-sum columns came out HUGEINT →
decimal128(38,0) vs Spark's int64 — values identical, typed
canonicalization diverged, driver hash red for a full round while the
value-level check.py stayed green).

For every oracle_sql.json entry with a dumped sibling, run the SQL in
DuckDB, export via .arrow(), and compare each column's Arrow type
against the Spark parquet schema. norm() first rewrites the benign
container flavors (large_string -> string, large_list -> list — reader
block-size choices with identical canonical forms); after that the
compare is EXACT — e.g. timestamp[us] vs timestamp[us, tz=...] is
flagged. Exit 0 iff no query has a column type mismatch.
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(t):
    s = str(t)
    # list element container flavors render identically downstream
    return s.replace("large_list", "list").replace("large_string", "string")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = []
    skipped = []
    for name in sorted(oracle):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            skipped.append(name)
            continue
        sql = oracle[name].replace("__VERIFY_OUT__", out_dir)
        try:
            d = con.execute(sql).arrow().schema
        except Exception as e:
            bad.append((name, f"duckdb error: {str(e)[:160]}"))
            continue
        s = pq.read_schema(spark_files[0])
        dt = {f.name: norm(f.type) for f in d}
        st = {f.name: norm(f.type) for f in s}
        for c in sorted(set(dt) | set(st)):
            a, b = st.get(c), dt.get(c)
            if a != b:
                bad.append((name, f"column {c}: spark={a} duckdb={b}"))
    if skipped:
        print(f"note: {len(skipped)} oracles had no dump (subset run)")
    if bad:
        for name, msg in bad:
            print(f"TYPE-DIFF {name}: {msg}")
        sys.exit(1)
    print(f"OK: {len(oracle) - len(skipped)} oracles type-identical "
          "through the Arrow path")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
