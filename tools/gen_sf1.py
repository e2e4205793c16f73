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

--skew mode (default DST probe_data/sf1skew): same 10x volume, but the
key distribution is deliberately pathological — the hot-key probe the
uniform sf1 can't provide:

- events: every 5th event (20% of 1M rows) is reassigned to ONE user
  (user_id 0), so every per-user operator (as-of join, sessionize,
  keep-last dedup, interval join) funnels a 200k-row partition through
  a single key.
- documents: every 5th doc gets a fixed 16-word boilerplate paragraph
  PREPENDED (chunk-aligned, so q85's fixed 16-word chunking sees one
  chunk text shared by 20% of the corpus — a hot groupBy group and a
  hot join key). Whole-doc shingle sets stay dominated by the original
  text, so MinHash near-dup rates stay natural (no quadratic
  candidate artifact); this is the realistic "shared boilerplate"
  skew, not an exact-clone explosion.

Compare per-query against the uniform sf1 run: a skew-tolerant plan
holds ~1x; a funneling plan shows the hot partition directly.
"""
import os
import sys
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SKEW = "--skew" in sys.argv
argv = [a for a in sys.argv[1:] if a != "--skew"]
SRC = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
DST = argv[1] if len(argv) > 1 else (
    "/root/repo/probe_data/sf1skew" if SKEW else "/root/repo/probe_data/sf1")
R = int(argv[2]) if len(argv) > 2 else 10
STRIDE = 10_000_000

# 16 words exactly: one full q85 chunk, shared verbatim by every
# skewed document.
BOILER = ("terms of service apply to all content on this site "
          "please review our privacy policy carefully")

os.makedirs(DST, exist_ok=True)

def write(name, table):
    # Realistic row-group granularity (default pyarrow writes ONE row
    # group for these sizes): a single-row-group file is ONE scan task
    # in Spark no matter how many byte-range splits it gets, which
    # serializes every scan-stage expression — including join-inferred
    # IsNotNull predicates over kernel columns — onto one core. Real
    # 100 TB tables have thousands of row groups; the probe should too.
    pq.write_table(table, os.path.join(DST, name + ".parquet"),
                   row_group_size=8192)
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
    out = pa.concat_tables(parts)
    if SKEW and name == "events":
        eid = out.column("event_id").to_numpy()
        uid = out.column("user_id").to_numpy().copy()
        hot = eid % 5 == 0
        uid[hot] = 0
        out = out.set_column(out.schema.get_field_index("user_id"), "user_id",
                             pa.array(uid, type=out.schema.field("user_id").type))
        print(f"[gen_sf1] events skew: user 0 owns {hot.mean():.0%} of rows")
    write(name, out)

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
docs_out = pa.concat_tables(parts)
if SKEW:
    ids = docs_out.column("doc_id").to_numpy()
    txt = docs_out.column("text").to_pylist()
    hot = ids % 5 == 0
    txt = [BOILER + " " + s if h else s for s, h in zip(txt, hot)]
    docs_out = docs_out.set_column(
        docs_out.schema.get_field_index("text"), "text",
        pa.array(txt, type=docs_out.schema.field("text").type))
    docs_out = docs_out.set_column(
        docs_out.schema.get_field_index("n_chars"), "n_chars",
        pa.array([len(s) for s in txt],
                 type=docs_out.schema.field("n_chars").type))
    print(f"[gen_sf1] documents skew: boilerplate chunk in {hot.mean():.0%} of docs")
write("documents", docs_out)

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
