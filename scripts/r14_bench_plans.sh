#!/bin/bash
set -x
cd /root/repo
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r14_full_local.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r14_full.log 2>&1
echo "BENCH1 done: $?"
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r14.log 2>&1
echo "PLANAUDIT done: $?"
grep '^\[info\] ' /tmp/planaudit_r14.log | sed 's/^\[info\] //' | \
  grep -v -E '^(welcome to sbt|loading |set current|running |done compiling|compiling )' > /root/repo/PLANS_r14.txt
wc -l /root/repo/PLANS_r14.txt
echo "ALL DONE"
