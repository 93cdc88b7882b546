#!/usr/bin/env python3
"""sf1 real-data gate — check.py's compare loop, plus the two things a
10x corpus needs that the driver's gate does not:

1. SHARED ORACLE MATERIALIZATION: the recursive minhash-walk oracles
   (q_dedup_keep / q_dedup_keep_best / q_dup_stats / q_curator_e2e)
   each re-derive the shingle->minhash->pair->closure chain (~11 min
   EACH at sf1, the r10 bound on gate breadth). graft.Verify dumps
   `oracle_shared.json` (ordered temp-table definitions) and
   `oracle_sql_served.json` (twins consuming them); this gate
   materializes each shared table ONCE and runs the served twin.
   The driver's own gate keeps running the self-contained canonical
   SQL — the twins are string-built in Scala from the same fragments.

2. PER-ORACLE TIMEOUT: an oracle whose DuckDB cost explodes at sf1
   records TIMEOUT (not FAIL) and the sweep continues, so one
   quadratic oracle cannot eat the wall-clock budget.

Usage: python3 scripts/sf1_gate.py <sfDir> <verifyOutDir> [timeout_s]
       [only_csv]
Writes a JSON report to <verifyOutDir>/gate_report.json and prints one
line per query: PASS/FAIL/TIMEOUT name rows oracle_seconds.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def fetch(rel):
    df = rel.df()
    cols = list(df.columns)
    rows = []
    for t in df.itertuples(index=False, name=None):
        row = []
        for x in t:
            if hasattr(x, "tolist"):
                x = x.tolist()
            row.append(x)
        rows.append(tuple(row))
    return cols, rows


def fingerprint(cols, rows):
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return [cols[i] for i in order], len(rows), h.hexdigest()


def with_timeout(con, sql, budget_s):
    """Run sql, interrupting the connection if it exceeds budget_s.
    Returns (cols, rows) or raises TimeoutError/duckdb errors."""
    timed_out = [False]

    def killer():
        timed_out[0] = True
        con.interrupt()

    t = threading.Timer(budget_s, killer)
    t.start()
    try:
        rel = con.sql(sql)
        out = fetch(rel) if rel is not None else ([], [])
        return out
    except Exception:
        if timed_out[0]:
            raise TimeoutError()
        raise
    finally:
        t.cancel()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    only = (set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
    con = duckdb.connect()
    # cap per-process memory so parallel subset gates (the only_csv
    # sharding this script exists for) can't sum past the box
    con.execute(f"SET memory_limit='{os.environ.get('GATE_MEM', '24GB')}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    served = {}
    shared = []
    if os.path.exists(f"{out_dir}/oracle_sql_served.json"):
        served = json.load(open(f"{out_dir}/oracle_sql_served.json"))
        shared = json.load(open(f"{out_dir}/oracle_shared.json"))
    if only is not None:
        missing = only - set(oracles)
        if missing:
            sys.exit(f"unknown queries: {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    # only check queries whose Spark dump exists (Verify may have run
    # a subset); a dump missing for a REQUESTED query is a FAIL
    present = {k: v for k, v in oracles.items()
               if os.path.isdir(f"{out_dir}/{k}") or only is not None}
    shared_done = set()
    report = {}
    n = {"PASS": 0, "FAIL": 0, "TIMEOUT": 0}
    for name, sql in sorted(present.items()):
        t0 = time.time()
        try:
            s_cols, s_rows = fetch(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            report[name] = {"status": "FAIL", "why": "no spark dump"}
            n["FAIL"] += 1
            continue
        use_sql = sql
        status = None
        if name in served:
            # materialize this twin's shared tables once per corpus
            try:
                for tname, tsql in shared:
                    if tname not in shared_done:
                        ts = time.time()
                        con.execute(
                            f"CREATE TEMP TABLE {tname} AS {tsql}")
                        shared_done.add(tname)
                        print(f"  [shared] {tname} materialized "
                              f"in {time.time() - ts:.1f}s")
                use_sql = served[name]
            except Exception as e:
                print(f"  [shared] materialization failed ({e}); "
                      f"falling back to canonical SQL")
        try:
            o_cols, o_rows = with_timeout(con, use_sql, budget)
        except TimeoutError:
            status = "TIMEOUT"
            report[name] = {"status": status, "secs": round(budget, 1)}
        except Exception as e:
            status = "FAIL"
            report[name] = {"status": status,
                            "why": f"oracle error: {str(e)[:200]}"}
        if status is None:
            sc, sn, sh = fingerprint(s_cols, s_rows)
            oc, on, oh = fingerprint(o_cols, o_rows)
            secs = round(time.time() - t0, 1)
            if sc != oc:
                status = "FAIL"
                report[name] = {"status": status,
                                "why": f"columns {sc} vs {oc}", "secs": secs}
            elif sn != on:
                status = "FAIL"
                report[name] = {"status": status,
                                "why": f"rows {sn} vs {on}", "secs": secs}
            elif sh != oh:
                status = "FAIL"
                report[name] = {"status": status, "why": "hash", "secs": secs}
            else:
                status = "PASS"
                report[name] = {"status": status, "rows": sn, "secs": secs}
        n[status] += 1
        extra = report[name].get("why", report[name].get("rows", ""))
        print(f"{status} {name} {extra} "
              f"({report[name].get('secs', budget)}s)", flush=True)
    print(f"== {n['PASS']} pass, {n['FAIL']} fail, "
          f"{n['TIMEOUT']} timeout ==")
    json.dump({"sf_dir": sf_dir, "totals": n, "queries": report},
              open(f"{out_dir}/gate_report.json", "w"), indent=1)
    sys.exit(1 if n["FAIL"] else 0)


if __name__ == "__main__":
    main()
