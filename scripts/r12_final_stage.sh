#!/bin/bash
set -x
cd /root/repo
TWO="q_vocab_report,q_sft_pack"
for pair in "/root/testdata/sf0.1:sf01:32g" "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g" "/root/repo/target/sf100:sf100:96g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$TWO SPARK_GRAFT_BENCH_OUT=/tmp/bench_vs_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/ev10_vs_$tag.log 2>&1
  echo "vs_${tag}_done=$?"
done
# complete quiet sf0.1 refresh over ALL queries
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf01_final.json \
  sbt -batch "runMain graft.Bench" > /tmp/ev11_full.log 2>&1
echo "full_done=$?"
# final gates
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.01" > /tmp/f7_plans.log 2>&1
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vfinal209" > /tmp/f8.log 2>&1
python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/vfinal209 > /tmp/f8_check.log 2>&1
sbt -batch test > /tmp/f9_test.log 2>&1
echo "gates_done=$?"
