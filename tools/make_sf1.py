#!/usr/bin/env python3
"""Derive a 10x scale step (sf1) from the driver's sf0.1 testdata.

SCALE.md's sf0.1 -> sf1 ratio experiment needs a dataset one order of
magnitude bigger than the largest driver-generated one. This derives it
mechanically from sf0.1 (10 key-offset replicas per table, so entity
counts AND row counts scale 10x and no join collapses onto shared keys),
writing to target/testdata/sf1. It is a TIMING dataset only - the
correctness gate runs exclusively on the driver's own testdata.

Usage: python3 tools/make_sf1.py [outDir]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf1"
R = 10  # replicas

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(generate_series(0, {R - 1})) AS r")


def gen(table, select_sql):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    out = f"{OUT}/{table}.parquet"
    con.execute(
        f"COPY (SELECT {select_sql} FROM {src} t CROSS JOIN reps) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table}: {n} rows")


def copy(table):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    out = f"{OUT}/{table}.parquet"
    con.execute(f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)")
    print(f"{table}: copied")


# key offsets per replica keep every replica's key space disjoint, so
# entity counts (graph nodes, users, docs, vectors) scale with the rows
gen("lineitem", """
    t.l_orderkey + r * 10000000 AS l_orderkey,
    t.l_partkey + r * 1000000 AS l_partkey,
    t.l_suppkey + r * 1000000 AS l_suppkey,
    t.l_linenumber, t.l_quantity, t.l_extendedprice, t.l_discount,
    t.l_tax, t.l_returnflag, t.l_linestatus, t.l_shipdate""")
gen("orders", """
    t.o_orderkey + r * 10000000 AS o_orderkey,
    t.o_custkey + r * 1000000 AS o_custkey,
    t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority""")
gen("customer", """
    t.c_custkey + r * 1000000 AS c_custkey,
    t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment""")
gen("supplier", """
    t.s_suppkey + r * 1000000 AS s_suppkey,
    t.s_name, t.s_nationkey, t.s_acctbal""")
gen("part", """
    t.p_partkey + r * 1000000 AS p_partkey,
    t.p_name, t.p_brand, t.p_type, t.p_size, t.p_retailprice""")
gen("events", """
    t.event_id + r * 10000000 AS event_id,
    t.ts,
    t.user_id + r * 1000000 AS user_id,
    t.event_type, t.value, t.props""")
# replica text transformed by a BIJECTIVE per-word suffix (w -> w_rK):
# within-replica duplicate/near-dup structure is preserved exactly
# (token mapping is 1:1), while cross-replica token universes are
# disjoint, so pair outputs scale linearly with replicas. Verbatim
# copies would give every doc ~10 duplicates and quadratic pair output
# (a bogus 47x "regression" on dedup_setsim_prefix); an INTERLEAVED
# replica token is worse still - it dominates frequency-weighted
# signatures and collapses each replica into one giant near-dup bucket.
gen("documents", """
    t.doc_id + r * 1000000 AS doc_id,
    CASE WHEN r = 0 THEN t.text
         ELSE array_to_string(list_transform(string_split(t.text, ' '),
                x -> x || '_' || CAST(r AS VARCHAR)), ' ')
    END AS text,
    t.lang, t.source,
    CAST(len(CASE WHEN r = 0 THEN t.text
         ELSE array_to_string(list_transform(string_split(t.text, ' '),
                x -> x || '_' || CAST(r AS VARCHAR)), ' ')
    END) AS BIGINT) AS n_chars""")
# vectors perturbed per replica so ANN structures don't see 10 exact
# copies of every point (a degenerate neighbor structure)
gen("embeddings", """
    t.vec_id + r * 1000000 AS vec_id,
    list_transform(t.embedding, x -> x + CAST(r AS FLOAT) * 0.001) AS embedding,
    t.label""")
copy("nation")
copy("region")
print(f"wrote {OUT}")
