#!/bin/bash
set -x
cd /root/repo
cp /tmp/keep_persisted_sf100.json /tmp/bench_r16_persisted_sf100.json 2>/dev/null
python3 scripts/sf100_chunks.py /root/repo/BENCH_r16_full_local.json > /tmp/r16_chunks.txt
while read -r name n qs; do
  [ "$name" = "excluded" ] && continue
  rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=$qs \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_sf100_$name.json \
    sbt -batch "runMain graft.Bench" > /tmp/r16_f_$name.log 2>&1
  echo "F_${name}_done=$?"
done < /tmp/r16_chunks.txt
echo "STAGE_F_COMPLETE"
