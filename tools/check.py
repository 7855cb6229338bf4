#!/usr/bin/env python3
"""Dev-only local oracle checker — mimics the driver's DuckDB compare.

NOT part of the Scala library (the engine has no python dependency); this
script just lets the builder run the same parquet-vs-DuckDB comparison the
driver runs, before committing.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # normalize -0.0 vs 0.0
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: exec error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {key}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        g = [tuple(canon(v) for v in row) for row in got[gcols].itertuples(index=False)]
        w = [tuple(canon(v) for v in row) for row in want[wcols].itertuples(index=False)]
        if len(g) != len(w):
            print(f"FAIL {key}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
