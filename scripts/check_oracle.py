#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt,
then for each dumped query result, run the oracle SQL in DuckDB over the same
sf tables and hash-compare (columns sorted by name, rows sorted by all
columns). Usage: python3 scripts/check_oracle.py [sfdir] [outdir] [json_out]
— json_out (optional) additionally writes a machine-readable per-key
artifact (the sf1 oracle-parity gate's record)."""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing: stringify everything deterministically
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            out[c] = col.map(lambda v: repr(v))
        elif "float" in str(col.dtype):
            out[c] = col.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        else:
            out[c] = col.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    import glob, os
    dumped = sorted(
        p.split("/")[-1] for p in glob.glob(f"{OUT}/*") if "." not in p.split("/")[-1])
    n_pass = n_fail = n_noracle = 0
    record = {}
    # keys that threw inside graft.Verify leave no dump to glob — without
    # this they'd silently vanish from the tally instead of failing
    fpath = f"{OUT}/failures.json"
    if os.path.exists(fpath):
        for name, err in json.load(open(fpath)).items():
            print(f"FAIL {name}: verify threw: {err[:200]}")
            record[name] = {"status": "fail", "err": err[:200]}
            n_fail += 1
    for name in dumped:
        try:
            got = duckdb.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read dump: {e}")
            record[name] = {"status": "fail", "err": f"unreadable dump: {e}"}
            n_fail += 1
            continue
        if name not in oracle:
            print(f"NOOR {name}: rows={len(got)} (rows-only check)")
            record[name] = {"status": "rows_only", "rows": len(got)}
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = {"status": "fail", "err": f"oracle SQL: {e}"[:200]}
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} != {list(ce.columns)}")
            record[name] = {"status": "fail", "err": "column mismatch"}
            n_fail += 1
        elif len(cg) != len(ce):
            print(f"FAIL {name}: rowcount {len(cg)} != {len(ce)}")
            record[name] = {"status": "fail",
                            "err": f"rowcount {len(cg)} != {len(ce)}"}
            n_fail += 1
        elif not cg.equals(ce):
            diff = (cg != ce).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print("   got:", cg.loc[i].to_dict())
                print("   exp:", ce.loc[i].to_dict())
            record[name] = {"status": "fail", "err": "value mismatch"}
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(cg)}")
            record[name] = {"status": "pass", "rows": len(cg)}
            n_pass += 1
    # schema comparison hint (not a gate here): spark parquet vs duckdb types
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if JSON_OUT:
        with open(JSON_OUT, "w") as jf:
            json.dump({"sf": SF, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_noracle, "keys": record},
                      jf, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
