#!/usr/bin/env python3
"""Output-type whitelist audit over a Verify dump directory.

Usage: python3 tools/schema_audit.py <verifyOutDir>

The driver's correctness gate reads every query's Spark parquet dump
with one reader and the DuckDB oracle result with another, then
canonicalizes cell values to compare. Types the two readers render
differently are a hazard CLASS, independent of the values being right —
round 12 proved it: the suite's only two DECIMAL-typed outputs were the
round's only hash-FAILs while being bit-identical cross-engine.

This tool enforces the whitelist that kills the failure class: every
column of every dumped query must be one of
  - integer types (int8/16/32/64, uint*) — exact in any reader
  - float32/float64 — both readers canonicalize at 4dp
  - string / large_string, bool
  - date32/date64 — rendered as ISO dates identically
  - timestamp[us] WITHOUT timezone — µs is DuckDB's native timestamp
    unit so no truncation occurs, and naive timestamps render
    identically in both readers; PROVEN safe empirically: p2_drop and
    r1_split_train have emitted exactly this type through 12 rounds of
    green driver hashes
  - list<whitelisted primitive> (one level; the checker canonicalizes
    element-wise)

Known hazards it rejects, with the reason:
  - decimal128/decimal256: pandas renders via float, DuckDB keeps
    native Decimal scale → different canonical strings (round 12).
  - timestamp in s/ms/ns or WITH a timezone: ns-vs-µs truncation and
    tz rendering differ between readers; queries must project naive
    µs timestamps, unix seconds/µs (BIGINT), or an ISO string.
  - binary: bytes repr differs (hex vs escaped); project a hex string.
  - struct / map / nested list: field-order and null rendering are
    reader-specific; flatten or JSON-encode in the projection.

Exit 0 iff every output column is whitelisted.

When the dump is a FULL run (one dir per registered query, detected by
dir count >= oracle_sql.json entry count), also audits the documented
counts: README.md's "N queries / M with DuckDB oracle SQL / R rows-only"
must equal the dump's actual counts, and every registered query name
must appear backticked in COVERAGE.md (the census convention). This
kills the drift class where code grows and the docs stay behind
(round 15: README said 344 while 346 were registered).
"""
import json
import re
import sys
import os
import glob

import pyarrow as pa
import pyarrow.parquet as pq

PRIMITIVE_OK = (
    pa.types.is_integer,
    pa.types.is_floating,
    pa.types.is_string,
    pa.types.is_large_string,
    pa.types.is_boolean,
    pa.types.is_date,
)


def primitive_ok(t):
    if pa.types.is_timestamp(t):
        return t.unit == "us" and t.tz is None
    return any(p(t) for p in PRIMITIVE_OK)


def type_ok(t):
    if primitive_ok(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return primitive_ok(t.value_type)
    return False


def main(out_dir):
    bad = []
    dirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*"))
                  if os.path.isdir(d))
    if not dirs:
        print(f"no query dumps under {out_dir}", file=sys.stderr)
        return 2
    n_cols = 0
    for d in dirs:
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            bad.append((name, "<no parquet files>", ""))
            continue
        schema = pq.read_schema(files[0])
        for field in schema:
            n_cols += 1
            if not type_ok(field.type):
                bad.append((name, field.name, str(field.type)))
    if bad:
        print(f"FAIL: {len(bad)} checker-hazard column(s) "
              f"across {len(dirs)} queries:")
        for name, c, t in bad:
            print(f"  {name}.{c}: {t}")
        return 1
    print(f"OK: {len(dirs)} queries, {n_cols} columns, "
          f"all types checker-safe")
    return audit_counts(out_dir, dirs)


def audit_counts(out_dir, dirs):
    """Full-run doc-count audit (no-op on subset dumps)."""
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        return 0
    oracle = json.load(open(oracle_path))
    names = [os.path.basename(d) for d in dirs]
    if len(names) < len(oracle):
        return 0  # subset iteration run; counts are meaningless
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_reg, n_oracle = len(names), len(oracle)
    n_rows_only = n_reg - n_oracle
    problems = []
    readme = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"(\d+) queries keyed by SURVEY", readme)
    mo = re.search(r"\((\d+) with DuckDB oracle SQL — (\d+) rows-only",
                   readme)
    if not m or int(m.group(1)) != n_reg:
        problems.append(f"README query count: doc says "
                        f"{m.group(1) if m else '?'}, dump has {n_reg}")
    if not mo or int(mo.group(1)) != n_oracle \
            or int(mo.group(2)) != n_rows_only:
        problems.append(
            f"README oracle/rows-only counts: doc says "
            f"{mo.groups() if mo else '?'}, dump has "
            f"({n_oracle}, {n_rows_only})")
    coverage = open(os.path.join(repo, "COVERAGE.md")).read()
    censused = set(re.findall(r"`([A-Za-z0-9_]+)`", coverage))
    missing = sorted(n for n in names if n not in censused)
    if missing:
        problems.append(f"COVERAGE.md census missing {len(missing)} "
                        f"registered queries: {', '.join(missing[:10])}")
    if problems:
        print(f"FAIL: doc-count drift ({n_reg} registered, "
              f"{n_oracle} oracle):")
        for p in problems:
            print(f"  {p}")
        return 1
    print(f"OK: doc counts consistent ({n_reg} registered, {n_oracle} "
          f"oracle, {n_rows_only} rows-only, all censused)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
