#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py /root/testdata/sf0.001 /tmp/verify_out
Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL from
<out>/oracle_sql.json in DuckDB against the sf tables; compares row count,
column names, and a value hash after sorting columns by name and rows by value.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare; round floats to 6 sig places like a hash would not...
    def conv(c):
        if pd.api.types.is_float_dtype(c):
            return c.map(lambda v: "null" if pd.isna(v) else f"{v:.6g}")
        return c.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = df.apply(conv)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: rows={len(spark_df)} (no oracle, rows-only)")
            continue
        try:
            # HUGEINT lint: DuckDB returns int128 for bare SUM(BIGINT); the
            # driver's hash is dtype-sensitive, so a HUGEINT column passes
            # the stringified compare below but fails the driver gate. Fail
            # loudly with the column name so the oracle gets a
            # CAST(... AS BIGINT) before it ever ships.
            hug = [(r[0], r[1]) for r in con.execute(
                f"DESCRIBE ({oracle[name]})").fetchall()
                if "HUGEINT" in str(r[1]).upper()]
            if hug:
                print(f"FAIL {name}: HUGEINT oracle column(s) "
                      f"{[h[0] for h in hug]} — add CAST(... AS BIGINT)")
                n_fail += 1
                continue
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {diff.sum()} differing rows; first:")
            print("  spark:", a[diff].head(2).to_dict("records"))
            print("  duck :", b[diff].head(2).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
