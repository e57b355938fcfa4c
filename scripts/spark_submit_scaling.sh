#!/usr/bin/env bash
# North-rule realization: run the IDENTICAL packaged job via spark-submit
# at two parallelism levels (local[N] / local[4N] stands in for N / 4N
# executors in this single-machine sandbox) and report docs/sec + scaling
# efficiency. Usage: scripts/spark_submit_scaling.sh [nDocs] [N]
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-200000}"
N="${2:-8}"

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | grep -v -- -tests | head -1)

run_at() { # cores nDocs outDir
  /opt/spark/bin/spark-submit \
    --master "local[$1]" \
    --driver-memory 24g \
    --conf spark.sql.shuffle.partitions="$1" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.ui.enabled=false \
    --class graft.SearchCli "$JAR" build "$2" "$3" 2>/dev/null \
    | grep '\[build\]'
}

echo "== warmup (JIT) =="
run_at "$N" $((NDOCS / 20)) "$(mktemp -d)"
echo "== local[$N] =="
run_at "$N" "$NDOCS" "$(mktemp -d)"
echo "== local[$((4 * N))] =="
run_at "$((4 * N))" "$NDOCS" "$(mktemp -d)"
