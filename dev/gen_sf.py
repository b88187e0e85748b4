#!/usr/bin/env python3
"""Dev-only scaled-corpus generator for the SCALING.md soak (round 11).

Generates an sf1-like corpus (default 10x sf0.1) by sampling the EMPIRICAL
marginals of /root/testdata/sf0.1 with a fixed seed, so the scaled tables
keep the driver corpus's distributions (lang mix, per-order line counts,
vocab + word frequencies, label clusters, event-type mix) while key spaces
scale linearly like TPC-H: part/supplier/customer/orders/lineitem/users x10,
nation/region fixed. Schemas match TestdataGate.expected byte-for-byte
(timestamp[us] NTZ, float32 embedding lists, int32 small keys).

This is a MEASUREMENT tool, not part of the library: the oracle gate still
runs only against the read-only driver corpus.

Usage: python3 dev/gen_sf.py [outdir] [mult]   (default /tmp/graft_sf1 10)
"""
import sys, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 10
rng = np.random.default_rng(1042)
con = duckdb.connect()

import os
os.makedirs(OUT, exist_ok=True)

def load(t):
    return con.execute(f"SELECT * FROM '{SRC}/{t}.parquet'").arrow()

def write(t, table):
    pq.write_table(table, f"{OUT}/{t}.parquet")
    print(f"{t}: {table.num_rows} rows")

def emp(col, n):
    """Sample n values from a column's empirical distribution."""
    a = col.to_numpy(zero_copy_only=False)
    return a[rng.integers(0, len(a), n)]

# region / nation: fixed dimensions, copy verbatim
for t in ("region", "nation"):
    write(t, load(t))

# part: x MULT rows, fresh key space, empirical attribute marginals
part0 = load("part")
n_part = part0.num_rows * MULT
write("part", pa.table({
    "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
    "p_name": pa.array(emp(part0["p_name"], n_part)),
    "p_type": pa.array(emp(part0["p_type"], n_part)),
    "p_brand": pa.array(emp(part0["p_brand"], n_part)),
    "p_retailprice": pa.array(emp(part0["p_retailprice"], n_part)),
    "p_size": pa.array(emp(part0["p_size"], n_part), pa.int32()),
}).select(part0.schema.names).cast(part0.schema))

sup0 = load("supplier")
n_sup = sup0.num_rows * MULT
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(n_sup, dtype=np.int64)),
    "s_name": pa.array([f"Supplier#{k:09d}" for k in range(n_sup)]),
    "s_nationkey": pa.array(emp(sup0["s_nationkey"], n_sup), pa.int32()),
    "s_acctbal": pa.array(emp(sup0["s_acctbal"], n_sup)),
}).select(sup0.schema.names).cast(sup0.schema))

cust0 = load("customer")
n_cust = cust0.num_rows * MULT
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
    "c_name": pa.array([f"Customer#{k:09d}" for k in range(n_cust)]),
    "c_nationkey": pa.array(emp(cust0["c_nationkey"], n_cust), pa.int32()),
    "c_mktsegment": pa.array(emp(cust0["c_mktsegment"], n_cust)),
    "c_acctbal": pa.array(emp(cust0["c_acctbal"], n_cust)),
}).select(cust0.schema.names).cast(cust0.schema))

ord0 = load("orders")
n_ord = ord0.num_rows * MULT
odate = emp(ord0["o_orderdate"], n_ord)
orders = pa.table({
    "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
    "o_orderstatus": pa.array(emp(ord0["o_orderstatus"], n_ord)),
    "o_totalprice": pa.array(emp(ord0["o_totalprice"], n_ord)),
    "o_orderdate": pa.array(odate, pa.timestamp("us")),
    "o_orderpriority": pa.array(emp(ord0["o_orderpriority"], n_ord)),
}).select(ord0.schema.names).cast(ord0.schema)
write("orders", orders)

# lineitem: per-order line count from the empirical distribution, so the
# co-purchase graph (q118/q121/q122 edges l_orderkey x l_partkey) scales in
# NODES not density — the same shape 10x the data
li0 = load("lineitem")
lines_per_order = con.execute(
    f"SELECT count(*) FROM '{SRC}/lineitem.parquet' GROUP BY l_orderkey"
).fetchnumpy()["count_star()"]
counts = lines_per_order[rng.integers(0, len(lines_per_order), n_ord)]
n_li = int(counts.sum())
okeys = np.repeat(np.arange(n_ord, dtype=np.int64), counts)
linenum = np.concatenate([np.arange(1, c + 1, dtype=np.int32) for c in counts]) \
    if n_ord else np.array([], dtype=np.int32)
write("lineitem", pa.table({
    "l_orderkey": pa.array(okeys),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
    "l_suppkey": pa.array(rng.integers(0, n_sup, n_li)),
    "l_linenumber": pa.array(linenum, pa.int32()),
    "l_quantity": pa.array(emp(li0["l_quantity"], n_li)),
    "l_extendedprice": pa.array(emp(li0["l_extendedprice"], n_li)),
    "l_discount": pa.array(emp(li0["l_discount"], n_li)),
    "l_tax": pa.array(emp(li0["l_tax"], n_li)),
    "l_returnflag": pa.array(emp(li0["l_returnflag"], n_li)),
    "l_linestatus": pa.array(emp(li0["l_linestatus"], n_li)),
    "l_shipdate": pa.array(emp(li0["l_shipdate"], n_li), pa.timestamp("us")),
}).select(li0.schema.names).cast(li0.schema))

# events: 10x rows, 10x users, SAME 30-day window (more traffic, not a
# longer history — keeps the windowed queries' state sizes honest)
ev0 = load("events")
n_ev = ev0.num_rows * MULT
n_users = 1500 * MULT
write("events", pa.table({
    "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
    "ts": pa.array(np.sort(emp(ev0["ts"], n_ev)), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, n_users, n_ev)),
    "event_type": pa.array(emp(ev0["event_type"], n_ev)),
    "value": pa.array(emp(ev0["value"], n_ev)),
    "props": pa.array([json.dumps({"k": int(k)}, separators=(", ", ": "))
                       for k in rng.integers(0, 100, n_ev)]),
}).select(ev0.schema.names).cast(ev0.schema))

# documents: same vocab + word-frequency + doc-length marginals; planted
# near-dup structure scaled linearly (1% near-dups with 1-3 word edits,
# 0.2% exact copies) so the dedup queries face the same duplicate RATE
doc0 = load("documents")
texts0 = doc0["text"].to_pylist()
words = np.concatenate([np.array(t.split()) for t in texts0])
vocab, freq = np.unique(words, return_counts=True)
p = freq / freq.sum()
lens = np.array([len(t.split()) for t in texts0])
langs = doc0["lang"].to_numpy(zero_copy_only=False)
n_doc = doc0.num_rows * MULT
doc_lens = lens[rng.integers(0, len(lens), n_doc)]
docs = []
for L in doc_lens:
    docs.append(" ".join(vocab[rng.choice(len(vocab), L, p=p)]))
n_near = n_doc // 100
n_exact = n_doc // 500
for i in rng.integers(0, n_doc, n_near):
    j = int(rng.integers(0, n_doc))
    w = docs[j].split()
    for _ in range(int(rng.integers(1, 4))):
        w[int(rng.integers(0, len(w)))] = str(vocab[int(rng.integers(0, len(vocab)))])
    docs[int(i)] = " ".join(w)
for i in rng.integers(0, n_doc, n_exact):
    docs[int(i)] = docs[int(rng.integers(0, n_doc))]
write("documents", pa.table({
    "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
    "text": pa.array(docs),
    "lang": pa.array(langs[rng.integers(0, len(langs), n_doc)]),
    "source": pa.array([f"src{int(s)}" for s in rng.integers(0, 20, n_doc)]),
    "n_chars": pa.array(np.array([len(d) for d in docs], dtype=np.int64)),
}).select(doc0.schema.names).cast(doc0.schema))

# embeddings: per-label gaussian fit to the sf0.1 clusters, sampled 10x —
# the ANN/SemDeDup queries see the same cluster geometry at 10x points
emb0 = load("embeddings")
vecs = np.stack(emb0["embedding"].to_pylist()).astype(np.float32)
labels0 = emb0["label"].to_numpy(zero_copy_only=False)
n_emb = emb0.num_rows * MULT
out_vecs, out_labels = [], []
for lab in np.unique(labels0):
    pts = vecs[labels0 == lab]
    k = len(pts) * MULT
    mu, sd = pts.mean(axis=0), pts.std(axis=0)
    out_vecs.append(rng.normal(mu, sd, size=(k, vecs.shape[1])).astype(np.float32))
    out_labels.append(np.full(k, lab, dtype=np.int32))
av = np.concatenate(out_vecs)
al = np.concatenate(out_labels)
perm = rng.permutation(len(al))
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(len(al), dtype=np.int64)),
    "embedding": pa.array(list(av[perm]), pa.list_(pa.float32())),
    "label": pa.array(al[perm], pa.int32()),
}).select(emb0.schema.names).cast(emb0.schema))
print("done ->", OUT)
