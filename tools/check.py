#!/usr/bin/env python
"""Local mimic of the driver's t2 correctness harness (dev-only tooling;
the shipped library is the Scala code under src/).

Usage: python tools/check.py [sfdir] [outdir] [query_filter...]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.
For each query: reads <outdir>/<name> parquet, runs the oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfdir), sorts columns
by name, sorts rows, compares values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
filters = sys.argv[3:]

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the DRIVER's harness cannot hash array cells (unhashable ndarray in
    # pandas sort) — mirror that here so a raw-array output fails locally
    # too instead of passing via a local-only tuple normalization (r1 bug)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, np.ndarray))).any():
            raise TypeError(
                f"column {c} holds array cells — driver harness would "
                "crash; serialize with array_join/to_json in the query")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df

names = sorted(oracle.keys())
declared = [os.path.basename(p) for p in glob.glob(f"{outdir}/*")
            if os.path.isdir(p)]
ok = fail = 0
for name in sorted(set(names) | set(declared)):
    if filters and not any(f in name for f in filters):
        continue
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING-RESULT {name}"); fail += 1; continue
    got = pd.read_parquet(res_dir)
    if name not in oracle:
        status = "ROWS-ONLY" if len(got) > 0 else "EMPTY!"
        print(f"{status:>14} {name} rows={len(got)}")
        if len(got) == 0: fail += 1
        else: ok += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"COLS-DIFF {name}: got={list(g.columns)} exp={list(e.columns)}")
        fail += 1; continue
    # DTYPE-DRIFT guard: the DRIVER's harness hashes stringified values,
    # so an int64 Spark column vs a float64 oracle column (e.g. DuckDB
    # sum(BIGINT) -> HUGEINT -> pandas float64) hashes "150" vs "150.0"
    # and fails there even though check_exact value-compare passes here
    # (the r9 ml_nelson_aalen red). Fail locally on any int/float/bool
    # class mismatch so this class can never again pass local-only.
    def dclass(dt):
        s = str(dt)
        if s.startswith(("int", "uint")): return "int"
        if s.startswith("float"): return "float"
        if s == "bool" or s == "boolean": return "bool"
        return "other"
    drift = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in g.columns
             if dclass(got[c].dtype) != dclass(exp[c].dtype)
             and "other" not in (dclass(got[c].dtype), dclass(exp[c].dtype))]
    if drift:
        for c, gd, ed in drift:
            print(f"DTYPE-DRIFT {name}.{c}: spark={gd} oracle={ed}")
        fail += 1; continue
    if len(g) != len(e):
        print(f"NROWS-DIFF {name}: got={len(g)} exp={len(e)}")
        fail += 1; continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                      check_exact=True)
        print(f"{'OK':>14} {name} rows={len(g)}")
        ok += 1
    except AssertionError as ex:
        print(f"VALUES-DIFF {name}: {str(ex).splitlines()[-1] if str(ex) else ex}")
        # show first differing rows
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print("   got:", g.loc[i].to_dict())
            print("   exp:", e.loc[i].to_dict())
        fail += 1

print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
