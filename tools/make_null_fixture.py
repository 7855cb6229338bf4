#!/usr/bin/env python3
"""Dev-only NULL-heavy fixture variant (round-10 checklist item).

The driver fixtures contain no NULLs, so NULL-handling divergences between
the engine and the DuckDB oracle are invisible to the per-round sweep (the
two join_asof_nearest bugs fixed in r9 were exactly this class). This
script clones an sf dir and deterministically (hash-of-key, no RNG) NULLs
out a slice of the VALUE-ish columns — timestamps, measures, text,
low-cardinality attributes — while keeping every key column intact, so
joins/groupings still have spine and the sweep exercises NULL semantics
(three-valued predicates, NULL sort order, null-skipping aggregates,
NULL window frames) rather than degenerate empty joins.

Physical layout is preserved via pyarrow (DuckDB COPY would rewrite the
timestamp physical type and defeat the Tables loader's conversion logic).

Usage: python3 tools/make_null_fixture.py [srcSfDir] [destDir]
Then:  sbt "runMain graft.Verify <destDir> /tmp/verify_null"
       python3 tools/check.py <destDir> /tmp/verify_null
"""
import shutil, sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# table -> (key column driving the deterministic choice,
#           {column -> 1-in-N null rate})
PLAN = {
    "events": ("event_id", {"ts": 17, "value": 11, "props": 7,
                            "event_type": 13, "user_id": 23}),
    "orders": ("o_orderkey", {"o_orderdate": 17, "o_totalprice": 11,
                              "o_orderstatus": 13, "o_orderpriority": 7}),
    "documents": ("doc_id", {"text": 13, "lang": 7, "source": 11,
                             "n_chars": 17}),
    "lineitem": ("l_orderkey", {"l_shipdate": 17, "l_quantity": 19,
                                "l_discount": 13, "l_returnflag": 23}),
    "customer": ("c_custkey", {"c_acctbal": 11, "c_mktsegment": 7}),
    "embeddings": ("vec_id", {"embedding": 19, "label": 7}),
}


def nullify(src, dest, key, rates):
    t = pq.read_table(src)
    k = t.column(key)
    cols = []
    for f in t.schema:
        c = t.column(f.name)
        if f.name in rates:
            n = rates[f.name]
            # deterministic per-(column, key): null where
            # (key + sum(ord(colname))) % n == 0 — same rows every run
            salted = pc.add(k, sum(map(ord, f.name)))
            mask = pc.equal(
                pc.subtract(salted, pc.multiply(pc.divide(salted, n), n))
                .cast(pa.int64()),
                pa.scalar(0, pa.int64()))
            c = pc.if_else(mask, pa.nulls(len(t), f.type), c)
        cols.append(c)
    out = pa.table(cols, schema=t.schema)
    pq.write_table(out, dest)
    nulled = {name: out.column(name).null_count for name in rates}
    print(f"{dest}: rows={len(out)} nulls={nulled}")


def main(src_dir="/root/testdata/sf0.01", dest_dir="/tmp/graft_nullfix"):
    import os
    os.makedirs(dest_dir, exist_ok=True)
    for t in TABLES:
        src = f"{src_dir}/{t}.parquet"
        dest = f"{dest_dir}/{t}.parquet"
        if t in PLAN:
            key, rates = PLAN[t]
            nullify(src, dest, key, rates)
        else:
            shutil.copyfile(src, dest)
            print(f"{dest}: copied verbatim")


if __name__ == "__main__":
    main(*sys.argv[1:])
