#!/bin/bash
# Bench-noise protocol (VERDICT r5 task #1): N consecutive runs of
# graft.Bench at sf0.1 on the same compiled classes, each output saved
# whole. Run via java -cp directly (same flags build.sbt passes to the
# forked `sbt runMain` process) so sbt startup doesn't pollute timings.
set -u
RUNS="${1:-3}"
OUT="${2:-/root/repo/tools/bench_series_r6}"
mkdir -p "$OUT"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
for i in $(seq 1 "$RUNS"); do
  echo "=== run $i/$RUNS $(date -u +%H:%M:%S) ===" >&2
  # per-run detail file: the full-precision record (incl. the per-query
  # load and cpu columns) is the adjudication evidence — one shared
  # driver-default path would keep only the last run's
  SPARK_GRAFT_BENCH_DETAIL="$OUT/run${i}_detail.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > "$OUT/run$i.json" 2> "$OUT/run$i.err"
  echo "run $i exit=$?" >&2
done
echo "series done" >&2
