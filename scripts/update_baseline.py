#!/usr/bin/env python3
"""Persist a quiet-close bench run as BASELINE_BENCH.json.

Usage: python3 scripts/update_baseline.py [bench_detail.json] [round]

Run `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.Bench'`
on a QUIET machine (loadavg well under the core count, no concurrent
sbt), then point this script at the side file it wrote. The output is
the cross-round reference graft.Bench reads at startup:
  - probe_median_s: the quiet probe constant — a later run whose own
    probe median exceeds 2x this value is globally contended, and its
    rows are retimed/stamped against the per-query times below.
  - times: per-query quiet seconds (the denominators for the
    ratio_vs_baseline map each run emits).
  - machine: fingerprint so a baseline from different hardware is
    recognizably stale.

Commit the refreshed file each round (r7 verdict item 8).
"""
import json
import os
import platform
import sys

detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
rnd = int(sys.argv[2]) if len(sys.argv) > 2 else 0

with open(detail_path) as f:
    d = json.load(f)

probes = sorted(d.get("probes", []))
if not probes:
    sys.exit("no probes in side file — not a complete bench run")
probe_median = probes[len(probes) // 2]
calib = d.get("calib", {})
if calib.get("load_pre", 99) > os.cpu_count() / 2 or \
   calib.get("load_post", 99) > os.cpu_count() / 2:
    print(f"WARNING: loadavg {calib.get('load_pre')}/{calib.get('load_post')}"
          " during the run — this may not be a quiet baseline",
          file=sys.stderr)

times = {k: v for k, v in d.get("times", {}).items() if v >= 0}
out = {
    "round": rnd,
    "sf": d.get("sf"),
    "probe_median_s": round(probe_median, 3),
    "n_queries": len(times),
    "total_s": round(sum(times.values()), 1),
    "machine": {
        "cpus": os.cpu_count(),
        "platform": platform.platform(),
        "load_at_run": [calib.get("load_pre"), calib.get("load_post")],
    },
    "times": {k: round(v, 3) for k, v in sorted(times.items())},
}
with open("BASELINE_BENCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"BASELINE_BENCH.json: {len(times)} queries, "
      f"probe_median {out['probe_median_s']}s, total {out['total_s']}s")
