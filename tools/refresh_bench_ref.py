#!/usr/bin/env python3
"""Merge a fresh full-suite bench line into BENCH_ref.json.

BENCH_ref.json holds, per query, the best (lowest) known in-suite
seconds on the reference dataset — the noise-immunity baseline Bench's
solo-warm adjudication pass compares against. This keeps the refresh
mechanical and auditable: ref[q] = min(old_ref[q], new_run[q]); queries
new to the suite are seeded from the run, and ref entries for queries
no longer in the suite are pruned (reported) so the baseline tracks the
live query set instead of accreting dead keys forever.

Usage: python3 tools/refresh_bench_ref.py <bench_json_line_file>
       (the file's LAST line containing "metric" is used)
"""
import json
import sys

src = sys.argv[1]
metric_lines = [l for l in open(src) if '"metric"' in l]
if not metric_lines:
    sys.exit(f"error: no line containing \"metric\" in {src} — "
             "was the bench run aborted before printing its JSON line?")
run = json.loads(metric_lines[-1])
if "queries" not in run or not isinstance(run["queries"], dict):
    sys.exit(f"error: bench line in {src} has no per-query map — "
             "refusing to refresh from a partial run")
ref_path = "BENCH_ref.json"
ref = json.load(open(ref_path))
assert ref.get("sf") == run.get("sf"), (
    f"sf mismatch: ref {ref.get('sf')} vs run {run.get('sf')}")
old = ref.get("queries", {})
new = run["queries"]
# --reset q1,q2: replace (not min-merge) the named queries' refs with
# this run's numbers. For refs whose all-time minimum predates a
# harness change and is no longer reproducible (r19: pipeline_docs'
# 0.326 s predates the per-query GC/unpersist discipline — no first
# run of that plan can beat its own codegen time). Audit trail
# belongs in SCALE.md next to the reset.
reset = set()
if "--reset" in sys.argv:
    reset = set(sys.argv[sys.argv.index("--reset") + 1].split(","))
    missing = reset - set(new)
    if missing:
        sys.exit(f"error: --reset names not in this run: {sorted(missing)}")
merged = {q: new[q] if q in reset else
          (min(old[q], new[q]) if q in old else new[q])
          for q in sorted(new)}
improved = sum(1 for q in new if q in old and new[q] < old[q])
seeded = sorted(set(new) - set(old))
pruned = sorted(set(old) - set(new))
# a SUBSET run (Bench positional args / profiling) must never delete
# the baselines of unselected queries: refuse to prune unless the
# caller asserts a full-suite run with --prune
if pruned and "--prune" not in sys.argv:
    merged.update({q: old[q] for q in pruned})
    print(f"kept {len(pruned)} refs absent from this run (partial run? "
          "re-run with --prune after a FULL-suite bench to drop them):",
          ", ".join(pruned))
    pruned = []
ref["queries"] = merged
json.dump(ref, open(ref_path, "w"), indent=0, sort_keys=True)
print(f"merged {len(merged)} refs: {improved} improved, "
      f"{len(seeded)} seeded, {len(pruned)} pruned")
if seeded:
    print("seeded:", ", ".join(seeded))
if pruned:
    print("pruned (no longer in suite):", ", ".join(pruned))
