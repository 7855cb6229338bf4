#!/usr/bin/env python3
"""Dev-only NUMERIC-EDGE fixture variant (r11).

The NULL / empty-string / unicode fixtures probe string semantics; THIS
one probes the numeric conversion edges the driver fixture never
exercises because its values are uniformly 2-decimal and positive:

  - 3-decimal values ending in 5 (x.xx5): `round(value*100)` must pick a
    rounding MODE — HALF_UP vs banker's rounding is a classic
    cross-engine fork, and with exact 2dp inputs it never fires
  - negative values (sign interaction with round/floor/integer div —
    `//` floors toward -inf in DuckDB while Spark's `div` truncates
    toward zero; only negative operands expose it)
  - large magnitudes (1e9-scale: decimal sum headroom, cents at 1e11)
  - tiny magnitudes (0.001: quantization to zero cents)

~15% of events get an edge value (deterministic hash pick over four
edge classes). All other columns untouched.

Usage: python3 tools/make_numeric_fixture.py [srcSfDir] [destDir]
Then:  sbt "runMain graft.Verify <destDir> /tmp/verify_num"
       python3 tools/check.py <destDir> /tmp/verify_num
"""
import hashlib, os, shutil, sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_numfix"
os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f.endswith(".parquet"):
        shutil.copy(f"{src}/{f}", f"{dst}/{f}")


def h(salt, k):
    return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)


def edge_value(k):
    cls = h("ncls", k) % 4
    m = h("nmag", k) % 900 + 100            # 100..999
    if cls == 0:
        return m + 0.005 if h("nsgn", k) % 2 else m + 0.115   # half-cent ties
    if cls == 1:
        return -(m + (h("nfr", k) % 100) / 100.0)             # negatives
    if cls == 2:
        return float(m) * 1e7 + 0.25                          # ~1e9 scale
    return 0.001 if h("nsgn", k) % 2 else -0.004              # sub-cent


def perturb(path):
    t = pq.read_table(path)
    ids = t.column("event_id").to_pylist()
    vals = t.column("value").to_pylist()
    out, hit = [], 0
    for k, v in zip(ids, vals):
        if v is not None and h("nume", k) % 7 == 0:
            out.append(edge_value(k))
            hit += 1
        else:
            out.append(v)
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array(out, pa.float64()))
    pq.write_table(t, path)
    print(f"{path}: edge values on {hit} rows")


perturb(f"{dst}/events.parquet")
