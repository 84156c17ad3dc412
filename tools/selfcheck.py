#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify.scala's
output dir, runs each oracle SQL in DuckDB against the same parquet tables,
and compares (schema-insensitively on column order: columns sorted by name,
rows sorted by all columns). Usage: selfcheck.py <sfDir> <verifyOutDir>."""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = canon(con.sql(f"FROM '{out_dir}/{name}/*.parquet'"))
            ref = canon(con.sql(sql))
            if list(mine.columns) != list(ref.columns):
                print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
                n_fail += 1
                continue
            if len(mine) != len(ref):
                print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
                n_fail += 1
                continue
            mt = [str(t) for t in mine.dtypes]
            rt = [str(t) for t in ref.dtypes]
            if mt != rt:
                print(f"FAIL {name}: dtypes {mt} vs {rt}")
                n_fail += 1
                continue
            if not mine.equals(ref):
                neq = (mine != ref) & ~(mine.isna() & ref.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} differing rows; first:")
                print("  mine:", mine[bad].head(2).to_dict("records"))
                print("  ref :", ref[bad].head(2).to_dict("records"))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
