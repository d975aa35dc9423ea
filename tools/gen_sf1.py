#!/usr/bin/env python3
"""Generate a local sf1 (10x sf0.1) dataset for the scaling sweep.

The driver testdata stops at sf0.1; this builds sf1 as TEN perturbed
copies of sf0.1 so per-copy statistics match the real corpus while the
copies stay independent:

- documents: doc_id offset per copy; every token suffixed "_k" (k>0),
  so shingle/minhash/token spaces are disjoint across copies — near-dup
  structure is exactly 10 independent sf0.1 corpora (pair counts scale
  linearly by construction, the right shape for a dataflow scaling
  measurement). n_chars recomputed for the suffixed text.
- embeddings: vec_id offset; vectors cyclically shifted by k (norms and
  within-copy distances preserved; cross-copy vectors uncorrelated).
- events: event_id/user_id offset per copy (10x users over the same
  time span); ts kept as parquet TIMESTAMP(NANOS) via pyarrow — the
  type graft.operators.Tables.events requires.
- lineitem/orders: orderkey-space offset per copy; part/supplier/
  customer keys unchanged (fact grows, dimensions don't — how a real
  warehouse scales).
- dimension tables copied verbatim.

Usage: python3 tools/gen_sf1.py [outdir]   (default /root/repo/sf1_local)
Deterministic, no RNG anywhere.
"""
import sys
import shutil
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1_local"
COPIES = 10
OFF = 1_000_000          # id offset per copy (documents/embeddings/events users)
OFF_ORD = 100_000_000    # orderkey offset per copy

import os
os.makedirs(OUT, exist_ok=True)

for dim in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{OUT}/{dim}.parquet")
    print(f"copied {dim}")


# Row-group sizing: pyarrow's default (1Mi rows/group) concatenates each
# 10x table into 1-2 giant row groups, and BOTH engines parallelize
# parquet scans at row-group granularity — so every sf1 scan was pinned
# to 1-2 threads, a generator artifact, not a workload property (a real
# 10x corpus arrives as ~10x more files/splits). Size groups so scans
# can spread: ~128Ki rows for narrow fact tables, ~4Ki for the wide
# text/vector tables (documents rows are ~1 KB of text, embeddings carry
# a float vector), keeping groups in the sane multi-hundred-KB range.
GROUP_ROWS = {"documents": 4096, "embeddings": 4096}


def write(name, tables):
    t = pa.concat_tables(tables)
    pq.write_table(t, f"{OUT}/{name}.parquet",
                   row_group_size=GROUP_ROWS.get(name, 131072))
    print(f"wrote {name}: {t.num_rows} rows")


# ----- documents -----
d = pq.read_table(f"{SRC}/documents.parquet")
texts = d.column("text").to_pylist()
copies = []
for k in range(COPIES):
    if k == 0:
        tk, nk = d.column("text"), d.column("n_chars")
    else:
        suff = [" ".join(w + f"_{k}" for w in t.split()) for t in texts]
        tk = pa.array(suff, pa.string())
        nk = pa.array([len(t) for t in suff], pa.int64())
    copies.append(pa.table({
        "doc_id": pa.compute.add(d.column("doc_id"), k * OFF),
        "text": tk,
        "lang": d.column("lang"),
        "source": d.column("source"),
        "n_chars": nk,
    }))
write("documents", copies)

# ----- embeddings -----
e = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = e.column("embedding").to_pylist()
copies = []
for k in range(COPIES):
    vk = e.column("embedding") if k == 0 else pa.array(
        [v[k:] + v[:k] for v in vecs], pa.list_(pa.float32()))
    copies.append(pa.table({
        "vec_id": pa.compute.add(e.column("vec_id"), k * OFF),
        "embedding": vk,
        "label": e.column("label"),
    }))
write("embeddings", copies)

# ----- events (preserve timestamp[ns]) -----
ev = pq.read_table(f"{SRC}/events.parquet")
copies = []
for k in range(COPIES):
    copies.append(pa.table({
        "event_id": pa.compute.add(ev.column("event_id"), k * OFF),
        "ts": ev.column("ts"),
        "user_id": pa.compute.add(ev.column("user_id"), k * OFF),
        "event_type": ev.column("event_type"),
        "value": ev.column("value"),
        "props": ev.column("props"),
    }))
write("events", copies)

# ----- orders / lineitem -----
o = pq.read_table(f"{SRC}/orders.parquet")
write("orders", [
    pa.table({c: (pa.compute.add(o.column(c), k * OFF_ORD)
                  if c == "o_orderkey" else o.column(c))
              for c in o.column_names})
    for k in range(COPIES)])

li = pq.read_table(f"{SRC}/lineitem.parquet")
write("lineitem", [
    pa.table({c: (pa.compute.add(li.column(c), k * OFF_ORD)
                  if c == "l_orderkey" else li.column(c))
              for c in li.column_names})
    for k in range(COPIES)])
