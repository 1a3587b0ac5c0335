#!/bin/bash
# Round-7 bench sweep — run STRICTLY SERIALLY (one sbt at a time; a
# concurrent invocation corrupts timings and may fail on the project
# lock). Order: the 9-pair scaling-gate protocol first (the judge's
# carried ask; quiet-host window matters most for Moran-complete, which
# sat exactly at 0.80 on 5 pairs in r6), then the semantic-dedup
# strong-scaling pairs + 4M wall.
set -u
cd /root/repo
GLOG=bench_raw_r7_scaling.log
SLOG=bench_raw_r7_semdedup.log

# --- 9-pair gate sweep: interleaved cpus=2 / cpus=8 at 2M rows,
# gated kernels only (moran complete, moran lookup, joincount) ---
for i in 1 2 3 4 5 6 7 8 9; do
  for c in 2 8; do
    SPARK_GRAFT_SCALE_N=2000000 SPARK_GRAFT_CPUS=$c \
    SPARK_GRAFT_SCALE_ONLY=moran,moran_lookup,joincount \
    sbt -batch "runMain graft.ScaleBench" 2>&1 | grep '"metric"' >> "$GLOG"
  done
  echo "PAIR$i done $(date -u +%H:%M:%S)" >> "$GLOG"
done
echo SCALEDONE >> "$GLOG"

# --- semantic dedup strong scaling: 3 interleaved pairs at 2M vectors,
# two-level forced (k = 2M/1024 = 1953 > twoLevelK=1024 -> k1=45,
# ~2025 cells at ~1000 occupancy) ---
for i in 1 2 3; do
  for c in 2 8; do
    SPARK_GRAFT_TEXT_N=1000 SPARK_GRAFT_TEXT_EMB=2000000 \
    SPARK_GRAFT_CPUS=$c SPARK_GRAFT_TEXT_ONLY=semantic_dedup \
    SPARK_GRAFT_SEM_TWOLEVELK=1024 \
    sbt -batch "runMain graft.TextBench" 2>&1 | grep '"metric"' >> "$SLOG"
  done
  echo "SEMPAIR$i done $(date -u +%H:%M:%S)" >> "$SLOG"
done

# --- 4M two-level wall at local[32] (k = 3906 > twoLevelK=2048 ->
# k1=63; 10g heap for the larger cached unit-vector frame) ---
SPARK_GRAFT_TEXT_N=1000 SPARK_GRAFT_TEXT_EMB=4000000 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_TEXT_ONLY=semantic_dedup SPARK_GRAFT_SEM_TWOLEVELK=2048 \
SPARK_DRIVER_MEM=10g \
sbt -batch "runMain graft.TextBench" 2>&1 | grep '"metric"' >> "$SLOG"
echo SEMDONE >> "$SLOG"
