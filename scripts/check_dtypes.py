#!/usr/bin/env python3
"""Dtype-parity sweep (dev tool; the shipped Scala library does not
depend on this). Kills the HUGEINT/DECIMAL output bug class by
construction: DESCRIBE every oracle SQL in DuckDB and fail if any
output column has a type pandas would widen away from Spark's
(HUGEINT -> float64 while Spark emits int64; DECIMAL -> string/object
while Spark emits a float or a differently-scaled decimal). A query
flagged here can pass the value gate today and fail it after a data
change — CAST the offending aggregate to BIGINT (or exact-cents
DOUBLE) in the shared SQL text instead.

Usage: python3 scripts/check_dtypes.py <sfDir> <oracle_sql.json | outDir>
"""
import sys, json, os
import duckdb

BAD = ("HUGEINT", "DECIMAL", "UHUGEINT")

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, path):
    if os.path.isdir(path):
        path = os.path.join(path, "oracle_sql.json")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(path))
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(b in t.upper() for b in BAD)]
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: non-portable output dtype — {cols}")
            n_bad += 1
    print(f"{len(oracle) - n_bad}/{len(oracle)} oracle queries dtype-clean")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
