#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares: row count, column names, and a value hash
computed over column-name-sorted, row-sorted stringified values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # FULL precision: the driver stringifies at full precision (a
        # pandas float64 of an integer renders "3.0", not "3" — this is
        # how the round-1/2 q_sessionize "hash flake" was really an
        # uncast HUGEINT sum becoming float64 in the oracle fetch).
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def fetch(rel):
    """Fetch a duckdb relation THROUGH PANDAS, like the driver: this is
    what turns HUGEINT (e.g. an uncast sum(BIGINT)) into float64 and
    makes int-vs-float diffs visible. Every oracle integer aggregate
    must therefore be ::BIGINT cast."""
    df = rel.df()
    cols = list(df.columns)
    rows = []
    for t in df.itertuples(index=False, name=None):
        row = []
        for x in t:
            if hasattr(x, "tolist"):      # numpy scalar or array
                x = x.tolist()
            row.append(x)
        rows.append(tuple(row))
    return cols, rows


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return cols_sorted, len(rows), h.hexdigest(), data


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names — check only these
    # (the sf1 heavy-subset gate runs one query at a time under a
    # wall-clock budget; the driver never passes it)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = only - set(oracles)
        if missing:
            # a misspelled name must NOT yield a vacuously green gate
            sys.exit(f"unknown queries: {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = fetch(spark_rel)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            n_fail += 1
            continue
        try:
            o_rel = con.sql(sql)
            o_cols, o_rows = fetch(o_rel)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        sc, sn, sh, sd = frame_fingerprint(s_cols, s_rows)
        oc, on, oh, od = frame_fingerprint(o_cols, o_rows)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}")
            n_fail += 1
        elif sh != oh:
            diff = [(a, b) for a, b in zip(sd, od) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
