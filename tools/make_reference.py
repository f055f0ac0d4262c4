#!/usr/bin/env python3
"""Write bench/REFERENCE.json — the per-query reference band graft.Bench's
quiet-run drift detection compares against — from a QUIET Bench record.

Usage:
  SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench" 2>&1 \
      | sed 's/^\[info\] //' | grep -F '"metric"' > /tmp/bench.jsonl
  python3 tools/make_reference.py /tmp/bench.jsonl [--reset q_a,q_b]

Takes the FIRST line (the full record with the named "queries" dict; the
tail line only carries the ms array). Refuses loaded records: the whole
point of the band is that it was measured quiet.

Dual band (r14 verdict finding 1): besides the last quiet record
(steady_sec), the file carries per-query HISTORICAL QUIET MINIMA
(steady_min_sec) folded across every refresh — min(new record, previous
steady_sec, previous steady_min_sec), per query, same sf. Bench flags
drift against the MIN of both maps, so a refresh taken from an
ambient-elevated quiet record can never absorb an elevation: the old
minimum keeps the gate honest. When a query INTENTIONALLY slows (a
semantics change that buys quality — the q_semdedup_hier two-probe
class), pass --reset with its name so its minimum restarts from the new
record; the reset names are recorded in the file for the audit trail.
"""
import json, os, sys

argv = sys.argv[1:]
args, reset, skip = [], set(), False
for i, a in enumerate(argv):
    if skip:
        skip = False
    elif a == "--reset":
        if i + 1 >= len(argv):
            sys.exit("--reset requires a comma-separated query-name value")
        reset.update(x for x in argv[i + 1].split(",") if x)
        skip = True  # the value is --reset's, not a positional
    elif a.startswith("--reset="):
        reset.update(x for x in a.split("=", 1)[1].split(",") if x)
    elif not a.startswith("--"):
        args.append(a)

src = args[0] if args else "/tmp/bench.jsonl"
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

# a reset name must exist in the record: a typo'd or deleted-query name
# would otherwise silently not apply while still landing in
# reset_history — an audit entry for a reset that never happened, with
# the intended query flagging drift forever (r15 ADVICE)
bad_reset = sorted(reset - set(rec["queries"]))
if bad_reset:
    sys.exit(f"--reset names not in the record's queries: {bad_reset}")

steady = {k: round(v, 3) for k, v in sorted(rec["queries"].items())}

# fold historical quiet minima from the previous band (same sf only);
# queries deleted from the registry drop, new queries start at the new
# record, --reset names restart at the new record
prev_min, prev_resets = {}, []
ref_path = "bench/REFERENCE.json"
if os.path.exists(ref_path):
    with open(ref_path) as f:
        prev = json.load(f)
    if prev.get("sf") == rec["sf"]:
        for k, v in prev.get("steady_sec", {}).items():
            prev_min[k] = min(v, prev_min.get(k, v))
        for k, v in prev.get("steady_min_sec", {}).items():
            prev_min[k] = min(v, prev_min.get(k, v))
        prev_resets = prev.get("reset_history", [])
steady_min = {}
for k, v in steady.items():
    if k in reset or k not in prev_min:
        steady_min[k] = v
    else:
        steady_min[k] = min(v, prev_min[k])

ref = {
    "sf": rec["sf"],
    "source": {"total_sec": rec["value"], "loadavg_start": rec["loadavg_start"],
               "loadavg_q": load_q, "n_queries": len(rec["queries"])},
    "steady_sec": steady,
    "steady_min_sec": steady_min,
}
if reset or prev_resets:
    ref["reset_history"] = prev_resets + sorted(reset)
os.makedirs("bench", exist_ok=True)
with open(ref_path, "w") as f:
    json.dump(ref, f, indent=1)
n_hist = sum(1 for k in steady if steady_min[k] < steady[k])
print(f"bench/REFERENCE.json: {len(steady)} queries at sf={rec['sf']}, "
      f"total {rec['value']:.1f}s, loadavg_start {rec['loadavg_start']}; "
      f"historical min below last record on {n_hist} queries"
      + (f"; reset: {sorted(reset)}" if reset else ""))
