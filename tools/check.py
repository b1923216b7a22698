#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
same sf tables, and compares: row count, schema (column names), and values
(sorted columns by name, sorted rows, hashed).
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns, floats to repr
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            problems.append(f"schema {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
        elif canon(spark_df) != canon(duck_df):
            problems.append("hash mismatch")
            # show first diff
            a = spark_df.reindex(sorted(spark_df.columns), axis=1).sort_values(
                by=sorted(spark_df.columns)).reset_index(drop=True)
            b = duck_df.reindex(sorted(duck_df.columns), axis=1).sort_values(
                by=sorted(duck_df.columns)).reset_index(drop=True)
            n = min(len(a), len(b))
            for i in range(n):
                ra, rb = a.iloc[i], b.iloc[i]
                if any(str(ra[c]) != str(rb[c]) for c in a.columns):
                    problems.append(f"first diff row {i}:\n  spark: {dict(ra)}\n  duck:  {dict(rb)}")
                    break
        results[name] = "OK" if not problems else "; ".join(problems)
    width = max((len(k) for k in results), default=10)
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"-- {ok}/{len(results)} OK")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
