#!/usr/bin/env python3
"""Real-parquet scale-factor generator — extends the driver's testdata
to SFs the driver does not ship (sf1 = 10x sf0.1), closing the r9
verdict's top item: the heavy families' 100 TB claims must be gated on
REAL parquet at 10x (row-group pruning, footer costs, partition counts),
not on synthetic in-memory replication.

Matches the driver generator's schemas, key spaces and distributions,
measured from /root/testdata/sf0.1 (seed measurements in git history):
  - supplier/customer/part/orders scale 10x per SF decade; events 10x
    (same 30-day window, Poisson-denser); documents 10x; embeddings 4x
    (500 -> 2000 -> 8000), the driver's own sub-linear curve
  - lines-per-order ~ 1+Poisson(3.07) (measured), shipdate independent
    uniform; per-user event counts Poisson (uniform user draw);
    event value ~ Exp(50) rounded to cents; docs = 10..100 uniform
    words over the same 31-word vocab, lang p=(en .4, rest .15);
    embeddings = random unit 64-dim float32 (measured: no label
    clustering), label uniform 0..9
  - region/nation are SF-invariant and copied verbatim
  - row groups: 2^17 rows (several groups per big table - the pruning
    realism sf0.1's single-group files cannot give)

Usage: python3 scripts/gen_sf.py <sf> <outDir> [--skew] [--openvocab]
Deterministic: numpy PCG64 seeded per (sf, table) via sha256 (stable
across processes — Python hash() is PYTHONHASHSEED-salted).

Variants (each its own dir so the MAIN sf1 keeps matching the driver's
sf0.1 distributions — the cross-dir scaling laws in ScaleExponents
compare /root/testdata/sf0.1 against it and need like-for-like data):
  --skew      skewed-key rehearsal: ~30% of docs land on ONE source
              (src0) and ~30% of events on ONE user (user 0) — the
              head-domain / hot-join-key shape the salted families
              (prefix join, minhash bands, para dedup, q_skew_report)
              must survive at 10x.
  --openvocab every doc gets 2 extra words drawn with a Zipf-like
              rank law from a tail vocabulary sized 1x n_docs, so the
              df-in-[2,5] rarity window q_dedup_ngram keys on has a
              real tail at EVERY sf (the closed 30-word vocab
              saturates it at sf1 — r10 verdict item 5). Tail words
              are appended BEFORE dup planting, so planted pairs
              still share them.
"""
import hashlib
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 1 << 17

# 30 words — 'dup' is NOT vocabulary: the driver generator uses it as
# the planted near-duplicate marker (a dup doc = another doc's text +
# " dup", ~5% of docs, independent lang/source), measured at sf0.1
VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
DUP_RATE = 0.05
LANGS = ['en', 'de', 'es', 'fr', 'zh']
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PRIORITIES = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
ADJ = ['blue', 'cold', 'hot', 'large', 'new', 'old', 'red', 'small']
NOUN = ['anvil', 'bolt', 'gear', 'gizmo', 'plate', 'ring', 'rod', 'widget']
PTYPES = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
ETYPES = ['click', 'error', 'purchase', 'signup', 'view']


def rng(sf, table):
    # hashlib, NOT Python hash(): str hashing is salted per process
    # (PYTHONHASHSEED), which made every invocation generate different
    # data and every pinned sf1 number irreproducible (r10 ADVICE).
    seed = int(hashlib.sha256(f"42:{float(sf)}:{table}".encode())
               .hexdigest()[:15], 16)
    return np.random.default_rng(seed)


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"),
                   row_group_size=ROW_GROUP)
    print(f"  {name}: {table.num_rows} rows")


def day_ts(days_arr, base):
    # midnight timestamps, microsecond unit
    return (base + days_arr.astype('timedelta64[D]')).astype('datetime64[us]')


def gen(sf, out, skew=False, openvocab=False):
    mult = sf / 0.1  # vs the measured sf0.1 base
    n_supp = int(1000 * mult)
    n_cust = int(15000 * mult)
    n_part = int(20000 * mult)
    n_ord = int(150000 * mult)
    n_events = int(100000 * mult)
    n_docs = int(5000 * mult)
    n_emb = int(2000 * (4 ** np.log10(mult)))  # 4x per decade

    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):  # SF-invariant dims
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied (SF-invariant)")

    r = rng(sf, "supplier")
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2)}))

    r = rng(sf, "customer")
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, n_cust)]}))

    r = rng(sf, "part")
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
                   zip(r.integers(0, 8, n_part), r.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{b}" for b in r.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[r.integers(0, 6, n_part)],
        "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(r.uniform(900, 1000, n_part), 2)}))

    r = rng(sf, "orders")
    o_days = r.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(['O', 'P', 'F'])[r.integers(0, 3, n_ord)],
        "o_totalprice": np.round(r.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": day_ts(o_days, np.datetime64('1995-01-01')),
        "o_orderpriority": np.array(PRIORITIES)[r.integers(0, 5, n_ord)]}))

    r = rng(sf, "lineitem")
    per_order = 1 + r.poisson(3.07, n_ord)
    okeys = np.repeat(np.arange(n_ord), per_order)
    n_li = len(okeys)
    linenum = (np.arange(n_li) -
               np.repeat(np.cumsum(per_order) - per_order, per_order) + 1)
    qty = r.integers(1, 51, n_li).astype(np.float64)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * r.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(r.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(r.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(['A', 'N', 'R'])[r.integers(0, 3, n_li)],
        "l_linestatus": np.array(['F', 'O'])[r.integers(0, 2, n_li)],
        "l_shipdate": day_ts(r.integers(1, 2500, n_li),
                             np.datetime64('1995-01-01'))}))

    r = rng(sf, "events")
    span_us = 30 * 86400 * 1000000
    ts = np.sort(r.integers(0, span_us, n_events))
    n_users = int(1500 * mult)
    users = r.integers(0, n_users, n_events)
    if skew:  # hot join key: ~30% of events collapse onto user 0
        users = np.where(r.random(n_events) < 0.3, 0, users)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": (np.datetime64('2024-01-01', 'us') +
               ts.astype('timedelta64[us]')),
        "user_id": pa.array(users, pa.int64()),
        "event_type": np.array(ETYPES)[r.integers(0, 5, n_events)],
        "value": np.round(r.exponential(50.0, n_events), 2),
        "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n_events)]}))

    r = rng(sf, "documents")
    n_words = r.integers(10, 101, n_docs)
    words = np.array(VOCAB)[r.integers(0, len(VOCAB), int(n_words.sum()))]
    offs = np.concatenate([[0], np.cumsum(n_words)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    if openvocab:
        # Zipf-like tail: rank = floor(V * u^2) concentrates mass on
        # low ranks while the high ranks land in the df [2,5] window
        # (V scales with the corpus, so the window never saturates)
        tail_v = n_docs
        tail = (tail_v * r.random((n_docs, 2)) ** 2).astype(np.int64)
        texts = [f"{t} w{a} w{b}" for t, (a, b) in zip(texts, tail)]
    # plant near-dup copies (the dedup families' natural prey): ~5% of
    # docs take a random ORIGINAL doc's text + " dup"
    dup_ids = r.choice(n_docs, size=int(n_docs * DUP_RATE), replace=False)
    dup_set = set(dup_ids.tolist())
    originals = np.array([i for i in range(n_docs) if i not in dup_set])
    for i, b in zip(dup_ids, originals[r.integers(0, len(originals),
                                                  len(dup_ids))]):
        texts[i] = texts[b] + " dup"
    sources = r.integers(0, 20, n_docs)
    if skew:  # head domain: ~30% of docs collapse onto src0
        sources = np.where(r.random(n_docs) < 0.3, 0, sources)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[r.choice(5, n_docs, p=LANG_P)],
        "source": [f"src{i}" for i in sources],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    r = rng(sf, "embeddings")
    vecs = r.standard_normal((n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(r.integers(0, 10, n_emb), pa.int32())}))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    skew = "--skew" in sys.argv[3:]
    openvocab = "--openvocab" in sys.argv[3:]
    tag = (" [skew]" if skew else "") + (" [openvocab]" if openvocab else "")
    print(f"generating sf{sf} -> {out}{tag}")
    gen(sf, out, skew=skew, openvocab=openvocab)
    print("done")
