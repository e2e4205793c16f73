#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each query's parquet dump, runs its oracle SQL in DuckDB over the
same test tables, and compares schemas + values (exact match after
column-name sort; rows compared in order).

Usage: python3 tools/diffcheck.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        # dtype drift report (warning only; value compare is authoritative)
        for c in gcols:
            gt = got.schema.field(c).type
            et = exp.schema.field(c).type
            if str(gt) != str(et):
                print(f"  WARN {name}.{c}: spark={gt} duckdb={et}")
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows spark={got.num_rows} oracle={exp.num_rows}")
            n_fail += 1
            continue
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        erows = [tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first at {i}:")
            print(f"  cols : {gcols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
