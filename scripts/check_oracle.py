#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the
shipped Scala library does not depend on this). Usage:
  python3 scripts/check_oracle.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name, sorts rows, compares."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_dtypes

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "int64", "Int32", "Int64"):
            # nullable Int64: unifies widths without the float64 precision
            # loss above 2^53 (large keys / hash-derived BIGINTs)
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def dtype_mismatches(got: pd.DataFrame, exp: pd.DataFrame):
    """The driver's gate hashes raw values, so an Int64-vs-float64 column
    (e.g. a DuckDB HUGEINT sum arriving as float64) is a hard FAIL there.
    This mirror must be at least as strict: report every per-column dtype
    divergence instead of silently unifying widths (the old `reconcile()`
    masked exactly the q14a/rq1 HUGEINT bug family two rounds running).
    Fix the query, not the checker: CAST integer sums to BIGINT in the
    shared SQL text so both engines emit int64."""
    bad = []
    for c in got.columns:
        if c in exp.columns:
            a, b = str(got[c].dtype), str(exp[c].dtype)
            if a != b:
                bad.append(f"{c}: spark={a} oracle={b}")
    return bad

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Dtype-parity sweep runs FIRST, in the same process: a HUGEINT /
    # DECIMAL oracle output can pass today's value compare and still fail
    # the driver's raw-value hash after a data change, so it is a hard
    # failure here by construction (a query flagged below needs a CAST in
    # the shared SQL text, not a checker tweak).
    print("== dtype sweep ==")
    dtype_rc = check_dtypes.main(sf_dir, f"{out_dir}/oracle_sql.json")
    print("== value compare ==")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pq.read_table(res_dir).to_pandas())
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        dt = dtype_mismatches(got, exp)
        if dt:
            print(f"FAIL {name}: dtype mismatch — {'; '.join(dt)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        if not got.equals(exp):
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ")
            print("  got:", got[bad].head(3).to_dict("records"))
            print("  exp:", exp[bad].head(3).to_dict("records"))
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries without oracle: rows-only
    have = set(os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for name in sorted(have - set(oracle)):
        n = pq.read_table(f"{out_dir}/{name}").num_rows
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(have - set(oracle))} rows-only"
          + ("" if dtype_rc == 0 else " — AND dtype sweep FAILED (see top)"))
    return 1 if (n_fail or dtype_rc) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
