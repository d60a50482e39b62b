#!/bin/bash
# Round-16 evidence battery:
#  A. full sf0.1 bench (3 passes) -> BENCH_r16_full_local.json
#  B. PlanAudit -> PLANS_r16.txt
#  C. new/retouched rows at sf1 / sf10 (3 reps)
#  D. CompactProbe (now incl. the ANN family) at sf10 -> BENCH_compact_r16.json
#  E. persisted/maintained per-batch adjudication at sf100 (3 reps)
#  F. full sf100 suite in chunks (1 rep) from the r16 anchor
#     (judge r15 ask #8: per-chunk calib is recorded in each chunk's
#     JSON; outlier chunks get re-run on a quiet box before merging)
set -x
cd /root/repo
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r16_full_local.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r16_full.log 2>&1
echo "BENCH_FULL done: $?"
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r16.log 2>&1
echo "PLANAUDIT done: $?"
grep '^\[info\] ' /tmp/planaudit_r16.log | sed 's/^\[info\] //' | \
  grep -v -E '^(welcome to sbt|loading |set current|running |done compiling|compiling )' > /root/repo/PLANS_r16.txt
wc -l /root/repo/PLANS_r16.txt
NEW="q_embed_removed,q_ann_removed,q_ann_filtered,q_stream_embed_maintained,q_dedup_video,q_classify_linear,q_classify_linear_report,q_dedup_removed,q_ann_ivfpq_maintained,q_dedup_image,q_dedup_audio,q_stream_dedup_maintained"
for pair in "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$NEW SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_new_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/r16_c_$tag.log 2>&1
  echo "C_${tag}_done=$?"
done
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_APPENDS=8 SPARK_GRAFT_PROBE_OUT=/root/repo/BENCH_compact_r16.json \
  sbt -batch "runMain graft.tools.CompactProbe" > /tmp/r16_d_compact.log 2>&1
echo "D_compact_done=$?"
rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_ONLY="q_dedup_incremental_persisted,q_dedup_embed_incremental_persisted,q_ann_ivfpq_persisted,q_dedup_incremental,q_dedup_embed_incremental,q_dedup_incremental_maintained,q_dedup_embed_incremental_maintained,q_ann_ivfpq_maintained" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_persisted_sf100.json \
  sbt -batch "runMain graft.Bench" > /tmp/r16_e_sf100adj.log 2>&1
echo "E_adjudication_done=$?"
echo "STAGE_ABCDE_COMPLETE"
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
