#!/usr/bin/env bash
# Full six-fixture correctness sweep (the per-round gate, one command):
#   1. driver fixture  (sf0.01)         — the contract compare
#   2. NULL-heavy      (make_null_fixture.py)  — three-valued logic
#   3. empty-string    (make_empty_fixture.py) — degenerate string edges
#   4. unicode         (make_unicode_fixture.py) — multibyte char-vs-byte
#   5. numeric-edge    (make_numeric_fixture.py) — rounding/overflow/sign
#   6. extreme-ts      (make_tsedge_fixture.py) — pre-epoch/far-future time
# Each = graft.Verify dump + DuckDB hash compare. Exits nonzero on any red.
set -euo pipefail
cd "$(dirname "$0")/.."

run() { # run <fixtureDir> <outDir>
  sbt -batch "runMain graft.Verify $1 $2" >/dev/null
  python3 tools/check.py "$1" "$2" | tail -1
}

echo "== driver fixture (sf0.01) =="
run /root/testdata/sf0.01 /tmp/graft_sweep_sf001

echo "== NULL-heavy fixture =="
python3 tools/make_null_fixture.py /root/testdata/sf0.01 /tmp/graft_nullfix >/dev/null
run /tmp/graft_nullfix /tmp/graft_sweep_null

echo "== empty-string fixture =="
python3 tools/make_empty_fixture.py /root/testdata/sf0.01 /tmp/graft_emptyfix >/dev/null
run /tmp/graft_emptyfix /tmp/graft_sweep_empty

echo "== multibyte/unicode fixture =="
python3 tools/make_unicode_fixture.py /root/testdata/sf0.01 /tmp/graft_unifix >/dev/null
run /tmp/graft_unifix /tmp/graft_sweep_uni

echo "== numeric-edge fixture =="
python3 tools/make_numeric_fixture.py /root/testdata/sf0.01 /tmp/graft_numfix >/dev/null
run /tmp/graft_numfix /tmp/graft_sweep_num

echo "== extreme-timestamp fixture =="
python3 tools/make_tsedge_fixture.py /root/testdata/sf0.01 /tmp/graft_tsfix >/dev/null
run /tmp/graft_tsfix /tmp/graft_sweep_ts
