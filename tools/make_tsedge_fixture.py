#!/usr/bin/env python3
"""Dev-only EXTREME-TIMESTAMP fixture variant (r11).

The numeric fixture probes value-conversion edges; THIS one probes the
TIME edges the driver fixture never exercises because its events all
live in one month of 2024:

  - pre-epoch timestamps (negative epoch-µs: PER-TIMESTAMP ms
    conversion forks — Spark's `unix_millis` FLOORS µs→ms while
    DuckDB's `epoch_ms` truncates toward zero, so any pre-epoch
    operand converted individually is off by one ms on one side; the
    fix is to difference in exact µs first and divide ONCE (a
    non-negative delta, where floor == truncate). Integer division
    itself does NOT fork: DuckDB `//` truncates toward zero like
    Spark `div` (-7 // 2 = -3, verified on DuckDB 1.x). Also
    date_trunc/datediff sign handling)
  - the epoch boundary itself (1969-12-31 23:59:59.999999 vs
    1970-01-01 00:00:00.000001 — off-by-one-µs bucketing)
  - deep past (1904: pre-epoch week/month truncation, leap-century
    handling; kept ≥ 1900 to stay clear of parquet Julian-rebase modes)
  - far future (2260: beyond the int64 NANOSECOND range — anything that
    round-trips through nanos overflows here; µs arithmetic must not)

~10% of events get an edge timestamp (deterministic hash pick over the
edge classes). All other columns untouched.

Usage: python3 tools/make_tsedge_fixture.py [srcSfDir] [destDir]
Then:  sbt "runMain graft.Verify <destDir> /tmp/verify_tsedge"
       python3 tools/check.py <destDir> /tmp/verify_tsedge
"""
import datetime, hashlib, os, shutil, sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_tsfix"
os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f.endswith(".parquet"):
        shutil.copy(f"{src}/{f}", f"{dst}/{f}")


def h(salt, k):
    return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)


EPOCH = datetime.datetime(1970, 1, 1)


def edge_ts(k):
    cls = h("tcls", k) % 5
    jitter_us = h("tjit", k) % 86_400_000_000  # up to a day, µs precision
    if cls == 0:  # hours before the epoch: small negative epoch-µs
        return EPOCH - datetime.timedelta(microseconds=jitter_us + 1)
    if cls == 1:  # the first µs after the epoch
        return EPOCH + datetime.timedelta(microseconds=jitter_us % 1000 + 1)
    if cls == 2:  # deep past, µs-grained
        return datetime.datetime(1904, 6, 15) + datetime.timedelta(
            microseconds=jitter_us)
    if cls == 3:  # mid-60s: negative epoch-µs at month scale
        return datetime.datetime(1965, 3, 7) + datetime.timedelta(
            microseconds=jitter_us)
    # far future: beyond int64 NANOSECONDS (max ~2262-04-11)
    return datetime.datetime(2263, 1, 1) + datetime.timedelta(
        microseconds=jitter_us)


def perturb(path):
    t = pq.read_table(path)
    ids = t.column("event_id").to_pylist()
    tss = t.column("ts").to_pylist()
    out, hit = [], 0
    for k, v in zip(ids, tss):
        if v is not None and h("tsed", k) % 10 == 0:
            out.append(edge_ts(k))
            hit += 1
        else:
            out.append(v)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pa.array(out, pa.timestamp("us")))
    pq.write_table(t, path)
    print(f"{path}: edge timestamps on {hit} rows")


perturb(f"{dst}/events.parquet")
