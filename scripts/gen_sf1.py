#!/usr/bin/env python3
"""Generate a ~sf1 corpus (10x sf0.1) for the scale-stress probe
(SCALING.md). Replication preserves join semantics: each replica i
offsets every key column by i*OFF so fact->dim joins land on the same
replica's dim rows; replica 0 is BYTE-IDENTICAL to the original rows so
bounded anchors (doc_id < 200, vec_id < 600, ...) see exactly the sf0.1
data. Dim tables region/nation are copied (they are fixed domains, like
TPC-H). Embedding floats are perturbed per-replica only in vec_id (the
vector payload is reused - ANN cost is driven by row count x dims, not
by values). Deterministic, no RNG.

Usage: python3 scripts/gen_sf1.py [src_sf_dir] [out_dir] [factor]
"""
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10**9          # key offset per replica (far above any real key)
DOFF = 10**6         # documents/embeddings/events offset (smaller ids)

# table -> columns offset per replica (everything else copied verbatim)
KEYED = {
    "customer": {"c_custkey": OFF},
    "supplier": {"s_suppkey": OFF},
    "part": {"p_partkey": OFF},
    "orders": {"o_orderkey": OFF, "o_custkey": OFF},
    "lineitem": {"l_orderkey": OFF, "l_partkey": OFF, "l_suppkey": OFF},
    "events": {"event_id": DOFF, "user_id": OFF},
    "documents": {"doc_id": DOFF},
    "embeddings": {"vec_id": DOFF},
}
COPY = ["region", "nation"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"copied {t}")
    for t, offs in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {offs[c]} AS {c}" if c in offs else c for c in cols)
        # row-group granularity matters: a single 10x row group defeats
        # min/max pushdown on the bounded-anchor filters (vec_id < 400
        # etc.), which no real multi-file 100 TB table would — size
        # groups so each replica spans >= 2 groups, like the original
        # one-file-per-sf layout the anchors were designed against
        src_rows = con.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        rg = max(2048, min(122880, src_rows // 2))
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM '{SRC}/{t}.parquet', range({N}) r(i)
                  ORDER BY i)
            TO '{OUT}/{t}.parquet'
            (FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE {rg})""")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"wrote {t}: {n} rows")


if __name__ == "__main__":
    main()
