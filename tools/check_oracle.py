#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), row count, and exact cell values
(columns sorted by name, rows sorted for both sides).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort") \
        if len(df) else df
    return df.reset_index(drop=True)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            spark_df = pq.read_table(res_dir).to_pandas()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        mismatch = None
        kind_clash = None
        for c in s.columns:
            # the driver's hash is dtype-sensitive: int 123 vs float 123.0
            # mismatch there even though Python == accepts them
            ks, kd = s[c].dtype.kind, d[c].dtype.kind
            grp = lambda k: "int" if k in "iu" else ("float" if k == "f" else "obj")
            if grp(ks) != grp(kd):
                kind_clash = (c, str(s[c].dtype), str(d[c].dtype))
                break
        if kind_clash:
            c, ta, tb = kind_clash
            print(f"FAIL {name}: dtype clash col={c} spark={ta} duck={tb}")
            n_fail += 1
            continue
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                eq = (sv.astype(object).where(sv.notna(), None) ==
                      dv.astype(object).where(dv.notna(), None)) | (sv.isna() & dv.isna())
            except Exception:
                eq = pd.Series([str(a) == str(b) for a, b in zip(sv, dv)])
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, sv.iloc[i], dv.iloc[i],
                            str(sv.dtype), str(dv.dtype))
                break
        if mismatch:
            c, i, a, b, ta, tb = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={a!r}({ta}) duck={b!r}({tb})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    missing = set()  # queries with no oracle get rows-only check; fine
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
