#!/usr/bin/env python3
"""Assemble SF1_RESULTS.json from the round's sf1 artifacts:

  - the full-surface gate report (scripts/sf1_gate.py on testdata_sf1)
  - the SkewGate JSON line (graft.SkewGate on testdata_sf1_skew)
  - the openvocab gate report (sf1_gate.py on testdata_sf1_openvocab,
    the q_dedup_ngram rarity-window subset)
  - the real-parquet scaling exponents (graft.ScaleExponents real)

Usage: python3 scripts/sf1_results.py <gate_report.json> <skew.json>
           <openvocab_gate_report.json> <exponents.json>
           [exponents_sf1_sf2.json]
Writes SF1_RESULTS.json in the repo root. Each input is the verbatim
artifact its producer wrote — this script only arranges them and
derives the per-family oracle cost notes (the slowest oracles and
which family's DuckDB mirror they are). The optional 5th artifact is
the second scale decade (sf1 -> sf2, mult 2): two independent rungs
showing the measured exponent holds across decades, not just one
ratio.
"""
import json
import sys


def main():
    gate, skew, openvocab, exps = (json.load(open(p)) for p in sys.argv[1:5])
    exps2 = json.load(open(sys.argv[5])) if len(sys.argv) > 5 else None

    queries = {}
    slow = []
    for name, r in sorted(gate["queries"].items()):
        if r["status"] == "PASS":
            queries[name] = f"PASS {r['rows']} ({r['secs']}s)"
            slow.append((r["secs"], name))
        else:
            queries[name] = f"{r['status']} {r.get('why', '')} " \
                            f"({r.get('secs', '?')}s)"
    slow.sort(reverse=True)
    cost_notes = {n: f"{s}s" for s, n in slow[:12]}

    ov = openvocab["queries"].get("q_dedup_ngram", {})
    out = {
        "round": 11,
        "what": ("Full-surface oracle gate at sf1 (10x sf0.1, real "
                 "parquet, deterministic sha256-seeded generator — "
                 "r10 ADVICE fix, every number reproducible from the "
                 "repo) + skewed-key rehearsal + open-vocabulary "
                 "rarity-window fixture + real-parquet scaling laws. "
                 "Datasets: scripts/gen_sf.py 1 testdata_sf1 "
                 "[--skew|--openvocab]."),
        "oracle_sf1": {
            "pass": gate["totals"]["PASS"],
            "fail": gate["totals"]["FAIL"],
            "timeout": gate["totals"]["TIMEOUT"],
            "oracle_timeout_budget_s": 300,
            "queries": queries,
        },
        "oracle_cost_notes": {
            "slowest_oracles": cost_notes,
            "note": ("DuckDB mirror cost, not Spark cost — the r10 "
                     "bound on gate breadth. The recursive minhash-walk "
                     "closure (shingle->minhash->pairs->transitive "
                     "closure) is materialized ONCE as shared temp "
                     "tables and served to q_dedup_keep/_best, "
                     "q_dup_stats, q_curator_e2e (sf1_gate.py), which "
                     "is what makes the full 300+ surface affordable; "
                     "the remaining minutes-class oracles are the "
                     "window-heavy families (attribution, "
                     "capture-recapture, chunk walks) whose recursive "
                     "CTEs DuckDB evaluates row-by-row."),
        },
        "skew_gate": skew["skew_gate"],
        "openvocab": {
            "what": ("q_dedup_ngram's df-in-[2,5] rarity window on the "
                     "--openvocab fixture (Zipf-like tail vocabulary "
                     "sized 1x n_docs, appended before dup planting) — "
                     "the closed 30-word vocab saturates the window at "
                     "10x (r10 verdict item 5); the tail keeps it "
                     "populated at every SF."),
            "q_dedup_ngram": ov,
            "totals": openvocab["totals"],
        },
        "real_scaling_exponents": exps,
        "scaling_analysis": (
            "Sub-linear or ~linear everywhere the design claims it: "
            "ivf 0.21/0.21, etl_chunks 0.33/0.72, sessionize 0.14/0.13, "
            "bm25 0.41/0.95, attribution 0.43/noise across the two "
            "decades; minhash 0.87 (d1) and 0.96 on the open-vocabulary "
            "second decade (output pairs exactly linear, 2551 -> 5122) — "
            "its closed-vocab d2 reading of 1.23 is band-bucket crowding "
            "on a 31-word vocabulary, separated out by the openvocab "
            "counter-measurement. The one genuinely super-linear family "
            "is prefix_pairs (exact AllPairs, ~1.3 on BOTH fixtures): "
            "worst-case-quadratic completeness is the documented cost of "
            "the exact tier — the production path at scale is minhash "
            "candidates + exact verification on candidates only "
            "(q_dedup_eval's architecture), with the df cap as the "
            "pressure valve; prefix_pairs at sf2 is also the measurement "
            "excluded from the d2 sweep after its candidate spill "
            "transiently filled the disk."),
    }
    if exps2 is not None:
        out["real_scaling_exponents_sf1_to_sf2"] = exps2
    # further labeled exponent blocks: label=path (e.g. the openvocab
    # counter-measurements that separate fixture artifact from law)
    for arg in sys.argv[6:]:
        label, path = arg.split("=", 1)
        out[f"real_scaling_exponents_{label}"] = json.load(open(path))
    json.dump(out, open("SF1_RESULTS.json", "w"), indent=1)
    print(f"SF1_RESULTS.json: {gate['totals']} | skew families "
          f"{list(skew['skew_gate']['families'])} | openvocab "
          f"{openvocab['totals']}")


if __name__ == "__main__":
    main()
