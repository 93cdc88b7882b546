#!/usr/bin/env python3
"""Merge subset gate reports (sf1_gate.py only_csv shards) into one
full-surface report: union of per-query rows, recomputed totals.
A query appearing in several shards keeps the FIRST report's row (the
shards are disjoint by construction; overlap would mean a sharding
bug, so it is reported).

Usage: python3 scripts/merge_gate_reports.py <out.json> <in1.json> ...
"""
import json
import sys


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    queries = {}
    sf_dir = None
    for p in ins:
        r = json.load(open(p))
        sf_dir = sf_dir or r["sf_dir"]
        for name, row in r["queries"].items():
            if name in queries:
                print(f"WARNING: {name} in more than one shard", file=sys.stderr)
                continue
            queries[name] = row
    totals = {"PASS": 0, "FAIL": 0, "TIMEOUT": 0}
    for row in queries.values():
        totals[row["status"]] += 1
    json.dump({"sf_dir": sf_dir, "totals": totals,
               "queries": dict(sorted(queries.items()))},
              open(out_path, "w"), indent=1)
    print(f"{out_path}: {len(queries)} queries, {totals}")


if __name__ == "__main__":
    main()
