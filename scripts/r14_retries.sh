#!/bin/bash
set -x
cd /root/repo
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY="q_dedup_minhash_recall,q_dedup_ngram,q_dedup_report,q_dedup_spans_varlen" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_sf100_retry1.json \
  sbt -batch "runMain graft.Bench" > /tmp/r14_retry1.log 2>&1
echo "RETRY1_done=$?"
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY="q_dedup_embed_lsh" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_sf100_retry2.json \
  sbt -batch "runMain graft.Bench" > /tmp/r14_retry2.log 2>&1
echo "RETRY2_done=$?"
echo "RETRIES_COMPLETE"
