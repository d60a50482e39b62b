#!/bin/bash
set -x
cd /root/repo
TAIL3="q_split_leakage,q_ppl_buckets,q_boilerplate_cut"
for pair in "/root/testdata/sf0.1:sf01:32g" "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g" "/root/repo/target/sf100:sf100:96g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$TAIL3 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_tail_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/ev8_tail_$tag.log 2>&1
  echo "tail_${tag}_done=$?"
done
