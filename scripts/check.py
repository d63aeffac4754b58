#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala
parquet dumps against DuckDB running SparkEntry.oracleSql on the same
tables. Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for qname, sql in sorted(oracle.items()):
        if only and qname not in only:
            continue
        files = glob.glob(os.path.join(out_dir, qname, "*.parquet"))
        if not files:
            print(f"FAIL {qname}: no spark output"); n_bad += 1; continue
        try:
            spark_df = canon(pd.concat([pq.read_table(f).to_pandas() for f in files]))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {qname}: {e}"); n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {qname}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}"); n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {qname}: rows {len(spark_df)} vs {len(duck_df)}"); n_bad += 1; continue
        s, d = spark_df.astype(str), duck_df.astype(str)
        if not s.equals(d):
            diff = (s != d).any(axis=1)
            print(f"FAIL {qname}: values differ on {int(diff.sum())}/{len(s)} rows")
            merged = pd.concat([spark_df[diff].head(3).add_prefix("spark_"),
                                duck_df[diff].head(3).add_prefix("duck_")], axis=1)
            print(merged.to_string())
            n_bad += 1; continue
        # dtype check (schema-match approximation)
        st = [str(t) for t in spark_df.dtypes]; dt = [str(t) for t in duck_df.dtypes]
        flag = "" if st == dt else f"  [dtype diff {st} vs {dt}]"
        print(f"OK   {qname} ({len(spark_df)} rows){flag}")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
