#!/usr/bin/env python3
"""Dev-only EMPTY-STRING fixture variant (r10 continuation 2).

The NULL-heavy fixture (make_null_fixture.py) exercises three-valued
logic; THIS one exercises the other string edge neither driver fixture
contains: empty strings. ~12% of documents get text = "" (split("")
yields [""] in both engines, shingle clamps hit their floor, token "",
zero-length chunk windows) and ~10% of events get event_type = ""
(empty grouping keys, '' vs NULL distinction in joins/aggregates).
Deterministic (hash-of-key, no RNG); all other columns untouched so
keys keep their spine.

First full run (2026-08-14, 227 ops): 227/227 PASS — no divergence;
recorded in SURVEY §7.3.12.

Usage: python3 tools/make_empty_fixture.py [srcSfDir] [destDir]
Then:  sbt "runMain graft.Verify <destDir> /tmp/verify_empty"
       python3 tools/check.py <destDir> /tmp/verify_empty
"""
import hashlib, os, shutil, sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_emptyfix"
os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f.endswith(".parquet"):
        shutil.copy(f"{src}/{f}", f"{dst}/{f}")


def pick(tbl, keycol, salt, n):
    keys = tbl.column(keycol).to_pylist()
    return {i for i, k in enumerate(keys)
            if int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16) % n == 0}


def blank(path, keycol, salt, n, col):
    t = pq.read_table(path)
    idx = pick(t, keycol, salt, n)
    vals = [("" if i in idx else v) for i, v in enumerate(t.column(col).to_pylist())]
    t = t.set_column(t.schema.get_field_index(col), col, pa.array(vals, pa.string()))
    pq.write_table(t, path)
    print(f"{path}: {col} blanked on {len(idx)} rows")


blank(f"{dst}/documents.parquet", "doc_id", "empty", 8, "text")
blank(f"{dst}/events.parquet", "event_id", "etype", 10, "event_type")
