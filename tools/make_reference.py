#!/usr/bin/env python3
"""Write bench/REFERENCE.json — the per-query reference band graft.Bench's
quiet-run drift detection compares against — from a QUIET Bench record.

Usage:
  SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench" 2>&1 \
      | sed 's/^\[info\] //' | grep -F '"metric"' > /tmp/bench.jsonl
  python3 tools/make_reference.py /tmp/bench.jsonl

Takes the FIRST line (the full record with the named "queries" dict; the
tail line only carries the ms array). Refuses loaded records: the whole
point of the band is that it was measured quiet.
"""
import json, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.jsonl"
with open(src) as f:
    rec = None
    for line in f:
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            rec = json.loads(line)
            break
if rec is None:
    sys.exit("no full bench record (with a named \"queries\" dict) in " + src)

load_q = rec.get("loadavg_q", [])
if rec.get("loadavg_start", 99) >= 3.5 or (load_q and max(load_q) >= 9.0):
    sys.exit(f"record is load-contaminated (start={rec.get('loadavg_start')}, "
             f"q={load_q}) — a reference band must come from a quiet run")
if rec.get("failed"):
    sys.exit(f"record has failed queries: {rec['failed']}")

ref = {
    "sf": rec["sf"],
    "source": {"total_sec": rec["value"], "loadavg_start": rec["loadavg_start"],
               "loadavg_q": load_q, "n_queries": len(rec["queries"])},
    "steady_sec": {k: round(v, 3) for k, v in sorted(rec["queries"].items())},
}
os.makedirs("bench", exist_ok=True)
with open("bench/REFERENCE.json", "w") as f:
    json.dump(ref, f, indent=1)
print(f"bench/REFERENCE.json: {len(ref['steady_sec'])} queries at sf={rec['sf']}, "
      f"total {rec['value']:.1f}s, loadavg_start {rec['loadavg_start']}")
