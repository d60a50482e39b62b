#!/bin/bash
# Round-14 decade evidence:
#  B. new/changed rows at sf1 / sf10 (3 reps) and sf100 (1 rep, in C)
#  B100b. 3-rep per-batch adjudication of the three persisted rows at sf100
#  C. full sf100 suite in chunks from the r14 anchor, merged later
set -x
cd /root/repo
NEW="q_dedup_incremental_maintained,q_dedup_embed_incremental_persisted,q_ann_ivfpq_persisted,q_dedup_image,q_lm_trigram_kn,q_dedup_incremental_persisted,q_dedup_embed_incremental,q_ann_ivfpq,q_lm_bigram"
for pair in "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$NEW SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_new_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/r14_b_$tag.log 2>&1
  echo "B_${tag}_done=$?"
done
# B100b: persisted per-batch adjudication (ingest once per JVM, 3 passes)
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_ONLY="q_dedup_incremental_persisted,q_dedup_embed_incremental_persisted,q_ann_ivfpq_persisted,q_dedup_incremental,q_dedup_embed_incremental" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_persisted_sf100.json \
  sbt -batch "runMain graft.Bench" > /tmp/r14_b100b.log 2>&1
echo "B100b_done=$?"
echo "STAGE_B_COMPLETE"
# C: full sf100 chunks from the r14 anchor
python3 scripts/sf100_chunks.py /root/repo/BENCH_r14_full_local.json > /tmp/r14_chunks.txt
while read -r name n qs; do
  [ "$name" = "excluded" ] && continue
  rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=$qs \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_sf100_$name.json \
    sbt -batch "runMain graft.Bench" > /tmp/r14_c_$name.log 2>&1
  echo "C_${name}_done=$?"
done < /tmp/r14_chunks.txt
echo "STAGE_C_COMPLETE"
