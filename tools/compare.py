#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, compare against the Verify parquet
dumps (rows, schema names, sorted-value hash)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

ok, bad = [], []
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    sql = oracle[name]
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}")); continue
    got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not got_files:
        bad.append((name, "no spark output")); continue
    got = pd.concat([pd.read_parquet(f) for f in got_files], ignore_index=True)
    if sorted(got.columns) != sorted(want.columns):
        bad.append((name, f"cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")); continue
    if len(got) != len(want):
        bad.append((name, f"rows spark={len(got)} oracle={len(want)}")); continue
    g, w = canon(got), canon(want)
    # normalize timestamps to ns ints for comparison
    for c in g.columns:
        if "datetime" in str(g[c].dtype): g[c] = g[c].astype("datetime64[ns]").astype("int64")
        if "datetime" in str(w[c].dtype): w[c] = w[c].astype("datetime64[ns]").astype("int64")
    # the driver's hasher stringifies values, so an int-vs-float dtype
    # disagreement ("20" vs "20.0") is a hash mismatch even when values
    # are numerically equal — flag it here the way the driver would
    kind_bad = [c for c in g.columns
                if {g[c].dtype.kind, w[c].dtype.kind} == {"i", "f"}
                or {g[c].dtype.kind, w[c].dtype.kind} == {"u", "f"}]
    if kind_bad:
        bad.append((name, "dtype kind int-vs-float (driver hash would differ): "
                    + ", ".join(f"{c} spark={g[c].dtype} oracle={w[c].dtype}" for c in kind_bad)))
        continue
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as e:
        bad.append((name, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:4])))

# queries without oracle: rows-only
all_queries = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)]
no_oracle = sorted(set(all_queries) - set(oracle))
for name in no_oracle:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
    print(f"NOORACLE {name}: rows={n}")

print(f"\n== {len(ok)} MATCH, {len(bad)} MISMATCH ==")
for n in ok: print(f"  OK  {n}")
for n, why in bad: print(f"  BAD {n}: {why}")
sys.exit(1 if bad else 0)
