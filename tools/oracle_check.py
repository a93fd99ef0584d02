#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result produced by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against views named
after the tables in <sf_dir>, and compares row count, sorted column names,
and a hash of all values (column-name-sorted, like the driver).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes for hashing: timestamps -> iso strings, floats kept
    out = df.copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]").astype(str)
        elif str(out[c].dtype) == "object":
            out[c] = out[c].astype(str)
    return out.reset_index(drop=True)

def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            vals = ["%.9g" % v if pd.notna(v) else "NaN" for v in col]
        else:
            vals = [str(v) for v in col]
        h.update(("\x00".join(vals)).encode())
        h.update(b"\x01")
    return h.hexdigest()

def main(outdir, sfdir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{d}/*.parquet"))], ignore_index=True)
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        ok_rows = len(g) == len(e)
        ok_cols = list(g.columns) == list(e.columns)
        ok_hash = ok_rows and ok_cols and value_hash(g) == value_hash(e)
        if ok_hash:
            n_pass += 1
            print(f"✓ {name}: {len(g)} rows")
        else:
            n_fail += 1
            print(f"✗ {name}: rows {len(g)}vs{len(e)} cols_match={ok_cols} hash={ok_hash}")
            if ok_cols and ok_rows:
                for c in g.columns:
                    if value_hash(g[[c]]) != value_hash(e[[c]]):
                        print(f"    col {c} differs; got head={g[c].head(3).tolist()} exp head={e[c].head(3).tolist()}")
            else:
                print(f"    got cols {list(g.columns)}\n    exp cols {list(e.columns)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
