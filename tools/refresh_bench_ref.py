#!/usr/bin/env python3
"""Merge a fresh full-suite bench line into BENCH_ref.json.

BENCH_ref.json holds, per query, the best (lowest) known in-suite
seconds on the reference dataset — the noise-immunity baseline Bench's
solo-warm adjudication pass compares against. This keeps the refresh
mechanical and auditable: ref[q] = min(old_ref[q], new_run[q]); queries
new to the suite are seeded from the run.

Usage: python3 tools/refresh_bench_ref.py <bench_json_line_file>
       (the file's LAST line containing "metric" is used)
"""
import json
import sys

src = sys.argv[1]
line = [l for l in open(src) if '"metric"' in l][-1]
run = json.loads(line)
ref_path = "BENCH_ref.json"
ref = json.load(open(ref_path))
assert ref.get("sf") == run.get("sf"), (
    f"sf mismatch: ref {ref.get('sf')} vs run {run.get('sf')}")
old = ref.get("queries", {})
new = run["queries"]
merged = {q: min(old[q], new[q]) if q in old and q in new
          else (old.get(q) if q in old else new[q])
          for q in sorted(set(old) | set(new))}
improved = sum(1 for q in merged if q in old and q in new and new[q] < old[q])
seeded = len(set(new) - set(old))
ref["queries"] = merged
json.dump(ref, open(ref_path, "w"), indent=0, sort_keys=True)
print(f"merged {len(merged)} refs: {improved} improved, {seeded} seeded")
