#!/bin/bash
# Round-13: the two rows that exhaust executor memory at CPUS=32 on the
# current corpus retry at CPUS=16 — half the concurrent tasks, double
# the per-task memory share (the spark.executor.cores knob a real
# cluster tunes for wide-shuffle rows); noted in the merged artifact.
set -x
cd /root/repo
rm -rf /root/repo/spark-warehouse /tmp/blockmgr-* /tmp/spark-[0-9a-f]*
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_embed_lsh,q_graph_triangles_sampled \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_retry4.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_retry4.log 2>&1
echo "retry4_done=$?"
