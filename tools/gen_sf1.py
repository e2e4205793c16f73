#!/usr/bin/env python3
"""Generate a ~10x scale-probe dataset (sf1) from the driver's sf0.1
tables (gitignored probe_data/, NOT target/ — sbt clean wipes target), for benchmarking only (never correctness: the oracle gate stays
on driver data).

Design: each scaled table gets R=10 replicas. Replicas must look like
NEW data, not exact clones — exact-duplicate documents/embeddings would
put identical items in the same LSH buckets and quadratically inflate
candidate pairs, probing a data artifact instead of plan scaling. So:

- events: new unique event_ids (shifted by replica stride); user_id,
  ts, type, value kept — root = user_id % 5 keeps its distribution and
  every derived contract key space grows with event_id.
- documents: new doc_ids; text is a seeded word-shuffle of the source
  doc — same vocabulary, token counts and length distribution, fresh
  shingle sets (near-dup rate stays at the corpus's natural level).
- embeddings: new vec_ids; each replica adds small seeded N(0, 0.02)
  jitter per component — same cluster geometry, no exact duplicate
  points. Query sets keyed on vec_id < 10 keep their original rows.

Unscaled tables are symlinked from the source directory.
"""
import os
import sys
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/probe_data/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
STRIDE = 10_000_000

os.makedirs(DST, exist_ok=True)

def write(name, table):
    pq.write_table(table, os.path.join(DST, name + ".parquet"))
    print(f"[gen_sf1] {name}: {table.num_rows} rows")

def replicate_shifted(name, id_cols):
    """R replicas with the given id columns stride-shifted — unique ids
    per replica; shifting l_orderkey and o_orderkey by the SAME stride
    preserves the lineitem-orders join across replicas."""
    t0 = pq.read_table(os.path.join(SRC, name + ".parquet"))
    cols = {c: t0.column(c).to_numpy() for c in id_cols}
    parts = []
    for i in range(R):
        t = t0
        for c, vals in cols.items():
            t = t.set_column(t.schema.get_field_index(c), c,
                             pa.array(vals + i * STRIDE, type=t0.schema.field(c).type))
        parts.append(t)
    write(name, pa.concat_tables(parts))

# --- events / lineitem / orders ------------------------------------
replicate_shifted("events", ["event_id"])
replicate_shifted("lineitem", ["l_orderkey"])
replicate_shifted("orders", ["o_orderkey"])

# --- documents ------------------------------------------------------
doc = pq.read_table(os.path.join(SRC, "documents.parquet"))
did = doc.column("doc_id").to_numpy()
texts = doc.column("text").to_pylist()
parts = []
for i in range(R):
    if i == 0:
        t = doc
    else:
        rnd = random.Random(1000 + i)
        shuffled = []
        for s in texts:
            w = s.split(" ")
            rnd.shuffle(w)
            shuffled.append(" ".join(w))
        t = doc.set_column(doc.schema.get_field_index("text"), "text",
                           pa.array(shuffled, type=doc.schema.field("text").type))
        nchars = pa.array([len(s) for s in shuffled],
                          type=doc.schema.field("n_chars").type)
        t = t.set_column(doc.schema.get_field_index("n_chars"), "n_chars", nchars)
    t = t.set_column(doc.schema.get_field_index("doc_id"), "doc_id",
                     pa.array(did + i * STRIDE, type=doc.schema.field("doc_id").type))
    parts.append(t)
write("documents", pa.concat_tables(parts))

# --- embeddings -----------------------------------------------------
emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
vid = emb.column("vec_id").to_numpy()
vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
parts = []
for i in range(R):
    if i == 0:
        v = vecs
    else:
        rng = np.random.default_rng(2000 + i)
        v = vecs + rng.normal(0.0, 0.02, size=vecs.shape).astype(np.float32)
    t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                       pa.array(vid + i * STRIDE, type=emb.schema.field("vec_id").type))
    t = t.set_column(emb.schema.get_field_index("embedding"), "embedding",
                     pa.array(v.tolist(), type=emb.schema.field("embedding").type))
    parts.append(t)
write("embeddings", pa.concat_tables(parts))

# --- the rest: symlink ----------------------------------------------
for f in os.listdir(SRC):
    dst = os.path.join(DST, f)
    if not os.path.exists(dst):
        os.symlink(os.path.join(SRC, f), dst)
        print(f"[gen_sf1] {f}: symlinked")
