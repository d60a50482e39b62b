#!/bin/bash
# Round-13 final sf100 retry: re-measure the largest absolute movers vs
# the r11 artifact in ONE clean-disk JVM (adjudication evidence), with
# Single pass, same protocol. (The two executor-OOM rows retry
# separately at CPUS=16 — r13_retry4.sh.)
set -x
cd /root/repo
rm -rf /root/repo/spark-warehouse /tmp/blockmgr-* /tmp/spark-[0-9a-f]*
df -h / | tail -1
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q3_topk,q_curation_pipeline,q_boilerplate_cut,q_bpe_apply,q_agg_cube,q_decontaminate,q_astype,q_ann_ivf \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_retry3.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_retry3.log 2>&1
echo "retry3_done=$?"
