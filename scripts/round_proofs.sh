#!/bin/bash
# The per-round scale-proof ladder, codified (round-16): every
# SCALING.md section regenerated IN ORDER on ONE code revision, plus
# the full-suite sf1 oracle artifact. Run order matters — the report
# generators append to SCALING.md after scaling_report.py overwrites
# it, so a partial rerun mixes revisions.
#
#   1. corpora: target/sf1 (uniform 10x), target/sfskew (zipfian 10x)
#   2. benches: sf0.1, sf1, sfskew, sf1@2g heap, sf1@2g starved 8thr
#   3. reports: scaling (OVERWRITES SCALING.md), skew, memory
#   4. oracle:  scripts/sf1_oracle.sh — ALL registered keys vs DuckDB at sf1
#
# Hand-written sections (protocol ladder, provenance) are appended by
# the operator afterwards. Usage: scripts/round_proofs.sh
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
SF01="${SF01:-/root/testdata/sf0.1}"
SF1="$REPO/target/sf1"
SKEW="$REPO/target/sfskew"

# the proofs MUST run the revision being proven: run.sh execs java
# straight off target/scala-2.13/classes, so compile first (and never
# compile again while the ladder's JVMs are live — zinc deletes class
# files mid-run)
sbt -batch compile

[ -f "$SF1/events.parquet" ] || python3 scripts/gen_sf1.py "$SF01" "$SF1" 10
[ -f "$SKEW/events.parquet" ] || \
  python3 scripts/gen_skew.py "$SF01" "$SKEW" 10

# bench OUT SF_DIR CPUS [JAVA_OPTS] — SPARK_GRAFT_REPO is ALWAYS
# redirected so a proof run can never clobber a committed round
# artifact; BASELINE_QUERIES.json rides along to arm the regression
# gate (it only engages when the sf matches).
bench() {
  local out="$REPO/$1" sfd="$2" cpus="$3" opts="${4:-}"
  # fresh output dir per leg: with pipefail a crashed bench stops the
  # ladder, and a clean dir guarantees no stale BENCH_SUMMARY.json
  # from a previous proof run can masquerade as this revision's
  rm -rf "$out" && mkdir -p "$out"
  cp "$REPO/BASELINE_QUERIES.json" "$out/" 2>/dev/null || true
  echo "=== bench $1 (sf=$sfd cpus=$cpus mem=${SPARK_DRIVER_MEM:-8g}" \
       "opts=$opts) ==="
  SPARK_GRAFT_REPO="$out" SPARK_GRAFT_SF_DIR="$sfd" \
    SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_JAVA_OPTS="$opts" \
    scripts/run.sh graft.Bench | tail -1
  [ -f "$out/BENCH_SUMMARY.json" ] || {
    echo "bench $1 produced no BENCH_SUMMARY.json" >&2; exit 1; }
}

bench target/proof_sf01 "$SF01" 32
bench target/proof_sf1  "$SF1"  32
bench target/proof_skew "$SKEW" 32
SPARK_DRIVER_MEM=2g bench target/proof_mem2g "$SF1" 32
SPARK_DRIVER_MEM=2g bench target/proof_memstarved "$SF1" 8 \
  "-Dspark.memory.fraction=0.05"

cp target/proof_sf01/BENCH_SUMMARY.json BENCH_SF01.json
cp target/proof_sf1/BENCH_SUMMARY.json  BENCH_SF1.json
python3 scripts/scaling_report.py BENCH_SF01.json BENCH_SF1.json SCALING.md
python3 scripts/skew_report.py BENCH_SF1.json \
  target/proof_skew/BENCH_SUMMARY.json SCALING.md
python3 scripts/memory_report.py target/proof_memstarved/BENCH_SUMMARY.json \
  SCALING.md "2g, spark.memory.fraction=0.05" 8

scripts/sf1_oracle.sh "$SF1"
echo "=== round proofs complete ==="
