#!/usr/bin/env python3
"""Generate a SKEWED ~sf1 corpus (same 10x volume as gen_sf1.py, zipfian
key mass) for the skew stress probe. Real 100 TB corpora are never
uniform — one tenant dominates an event stream, one boilerplate footer
rides 30% of crawled docs, one mega-domain dwarfs the rest — and the
uniform sf1 replication cannot exercise the engine's skew mitigations
(AQE skew split, manual salt, PPJoin prefix filter, bounded per-key
top-k, the per-key sample cap's hot window).

Replica 0 stays BYTE-IDENTICAL to sf0.1 (bounded anchors see the
original rows); replicas 1..9 are warped deterministically (duckdb
hash(), no RNG):
  events:    ~90% of replicated rows collapse onto event_type='click'
             (the hot tenant every skew join must survive) and ~94%
             onto ONE user_id (~85% of ALL events — the hot
             window/top-k partition axis the round-15 verdict asked
             the window tier to be probed on).
  documents: ~30% of replicated docs get a shared 12-token boilerplate
             footer appended (hot shingles for the prefix filter, one
             hot span for dedup_substring); ~80% collapse onto
             source='megadomain' (sample_cap_per_key's giant key);
             n_chars recomputed to stay consistent with text.
  orders:    ~20% of replicated rows collapse onto ONE o_custkey (the
             mega-customer: per-key top-k's hot key, with its matching
             dim row in the replicated customer table), outside every
             replica-0 bounded anchor (o_custkey < 300).
  lineitem:  ~20% of replicated rows collapse onto ONE l_orderkey and
             (independently) ~20% onto ONE l_partkey — a mega-order and
             a mega-part. The hot keys are replica-5's copies of key 1
             (1 + 5*OFF), which EXIST in the replicated dims (so
             orders⋈lineitem and part⋈lineitem see a genuinely hot
             shuffle key with matching dim rows) but sit OUTSIDE every
             replica-0 bounded anchor (l_orderkey < 300 etc.) — the
             probe isolates shuffle skew, not anchor collision (a
             mega-group inside a pack-per-group anchor measures
             collect_list on a million-element array, a real but
             different hazard whose deployment guard is a group-size
             cap).
  embeddings + other TPC-H tables: uniform replication (vector and
             decimal kernels are row-count-driven, not key-skew-driven).

Usage: python3 scripts/gen_skew.py [src_sf_dir] [out_dir] [factor]
"""
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sfskew"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10**9
DOFF = 10**6

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

BOILER = (" the quick brown fox jumps over the lazy dog while the "
          "boilerplate footer repeats across the crawl")
HOT_USER = 31337

# per-table SELECT-expression warps applied ONLY to replicas i >= 1;
# every column not named here falls through to gen_sf1's offset-or-copy
SKEW = {
    "events": {
        "event_type": ("CASE WHEN i > 0 AND hash(event_id) % 10 < 9 "
                       "THEN 'click' ELSE event_type END"),
        "user_id": (f"CASE WHEN i > 0 AND hash(event_id * 7 + 1) % 100 < 94 "
                    f"THEN {HOT_USER} ELSE user_id + i * {OFF} END"),
    },
    "orders": {
        "o_custkey": (f"CASE WHEN i > 0 AND hash(o_orderkey * 17 + i) "
                      f"% 5 < 1 THEN 1 + 5 * CAST({OFF} AS BIGINT) "
                      f"ELSE o_custkey + i * {OFF} END"),
    },
    "documents": {
        "text": (f"CASE WHEN i > 0 AND hash(doc_id) % 10 < 3 "
                 f"THEN text || '{BOILER}' ELSE text END"),
        "source": ("CASE WHEN i > 0 AND hash(doc_id * 7 + 1) % 10 < 8 "
                   "THEN 'megadomain' ELSE source END"),
        "n_chars": (f"CAST(length(CASE WHEN i > 0 AND hash(doc_id) % 10 < 3 "
                    f"THEN text || '{BOILER}' ELSE text END) AS BIGINT)"),
    },
    "lineitem": {
        "l_orderkey": (f"CASE WHEN i > 0 AND hash(l_orderkey * 13 + i) "
                       f"% 5 < 1 THEN 1 + 5 * CAST({OFF} AS BIGINT) "
                       f"ELSE l_orderkey + i * {OFF} END"),
        "l_partkey": (f"CASE WHEN i > 0 AND hash(l_partkey * 29 + i) "
                      f"% 5 < 1 THEN 1 + 5 * CAST({OFF} AS BIGINT) "
                      f"ELSE l_partkey + i * {OFF} END"),
    },
}


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
        warp = SKEW.get(t, {})
        sel = ", ".join(
            f"{warp[c]} AS {c}" if c in warp else
            (f"{c} + i * {offs[c]} AS {c}" if c in offs else c)
            for c in cols)
        # realistic row groups (see gen_sf1.py): single-group files
        # silently defeat min/max pushdown and turn bounded scans linear
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
    # skew sanity report
    for q, label in [
        ("SELECT count(*) FILTER (event_type = 'click') * 1.0 / count(*) "
         f"FROM '{OUT}/events.parquet'", "events click share"),
        (f"SELECT count(*) FILTER (user_id = {HOT_USER}) * 1.0 / count(*) "
         f"FROM '{OUT}/events.parquet'", "hot-user share"),
        (f"SELECT count(*) FILTER (o_custkey = 1 + 5 * CAST({OFF} AS BIGINT)) "
         f"* 1.0 / count(*) FROM '{OUT}/orders.parquet'",
         "mega-customer order share"),
        (f"SELECT count(*) FILTER (source = 'megadomain') FROM "
         f"'{OUT}/documents.parquet'", "megadomain docs"),
        (f"SELECT count(*) FILTER (text LIKE '%boilerplate footer%') "
         f"FROM '{OUT}/documents.parquet'", "boilerplated docs"),
        (f"SELECT count(*) FILTER (l_orderkey = 1 + 5 * CAST({OFF} AS BIGINT)) FROM "
         f"'{OUT}/lineitem.parquet'", "mega-order lineitems"),
        (f"SELECT count(*) FILTER (l_partkey = 1 + 5 * CAST({OFF} AS BIGINT)) FROM "
         f"'{OUT}/lineitem.parquet'", "mega-part lineitems"),
    ]:
        print(f"{label}: {con.execute(q).fetchone()[0]}")


if __name__ == "__main__":
    main()
