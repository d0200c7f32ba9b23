#!/bin/bash
# Round-12 controlled GC collector matrix (VERDICT.md ask #2):
# collector {parallel, g1, g1conc4} x the four GC-sensitive 10x entries,
# 5 measured runs each inside one forked JVM (run index 1..5 doubles as
# the fresh->aged heap axis: fixture prep + earlier runs churn the heap
# the later runs inherit). Output: target/gcmatrix_<gc>.log with the
# bench JSON line (runs + per-run task-GC evidence from BenchProbe).
set -u
cd /root/repo
ENTRIES="t41_span_removal_10x,zipper_read_10x,pipeline_10x,t04_minhash_neardup_10x"
for GC in parallel g1 g1conc4; do
  echo "=== collector=$GC $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY="$ENTRIES" \
  SPARK_GRAFT_BENCH_RUNS=5 \
  SPARK_GRAFT_GC="$GC" \
  sbt -batch "runMain graft.Bench" > "target/gcmatrix_$GC.log" 2>&1
  echo "exit=$? $(date -u +%H:%M:%S)"
done
echo "MATRIX DONE"
