#!/usr/bin/env python3
"""Generate a documents-only probe slice at R replicas of sf0.1 (default
R=30, i.e. 3x the sf1 probe) into probe_data/sf3docs — the SECOND scale
point for q134_edit_distance_dedup.

Why this exists: q134's 10x-window ratio (sf0.1 -> sf1) straddles the
prefix-block occupancy transition — within-block candidate pairs grow
quadratically with occupancy until the 64-member cap saturates, after
which pair growth is linear in block count. One scale point on the bad
side of that curve can't distinguish "transition" from "superlinear
plan"; this slice sits past the transition (blocks saturated), where
the measured sf1 -> sf3docs ratio must come back ~linear in input.

Replication scheme matches gen_sf1.py's documents path exactly (seeded
word-shuffle per replica: same vocabulary/length distribution, fresh
shingle sets and fresh 16-char prefixes at the natural rate) so the two
probe dirs differ only in scale, never in data character. Only
documents.parquet is written — q134 reads nothing else.

Usage: python3 tools/gen_docs_probe.py [SRC] [DST] [R]
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/probe_data/sf3docs"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 30
STRIDE = 10_000_000

os.makedirs(DST, exist_ok=True)

doc = pq.read_table(os.path.join(SRC, "documents.parquet"))
did = doc.column("doc_id").to_numpy()
texts = doc.column("text").to_pylist()
parts = []
for i in range(R):
    if i == 0:
        t = doc
    else:
        # same seed family as gen_sf1.py: replicas 1..9 are IDENTICAL
        # to sf1's, so sf3docs is a strict superset of sf1's documents
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
out = pa.concat_tables(parts)
# row_group_size: see gen_sf1.py — single-row-group files serialize the
# scan stage to one task; real tables have thousands of row groups.
pq.write_table(out, os.path.join(DST, "documents.parquet"),
               row_group_size=8192)
print(f"[gen_docs_probe] documents: {out.num_rows} rows -> {DST}")
