#!/bin/bash
# Round-17 evidence battery. Judge r16 asks #1/#2/#8 baked in:
#  - stage F (full sf100 chunk suite) runs on the LEAK-FIXED build and
#    its merged artifact COMMITS as BENCH_sf100_r17.json
#  - the script ends by verifying no spawned JVM survives (the r16
#    driver-window collision cost the round its headline artifact)
#  - every stage logs its rc; outlier chunks are visible per-chunk
# Stages:
#  A. full sf0.1 bench (3 passes) -> BENCH_r17_full_local.json
#  B. PlanAudit -> PLANS_r17.txt
#  C. new/retouched rows at sf1 / sf10 (3 reps)
#  D. CompactProbe at sf10 -> BENCH_compact_r17.json
#  E. persisted/maintained per-batch adjudication at sf100 (3 reps)
#  F. full sf100 suite in chunks (1 rep)
set -x
cd /root/repo
clean_tmp() { rm -rf /tmp/blockmgr-* /tmp/spark-[0-9a-f]* spark-warehouse; }

clean_tmp
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_r17_full_local.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r17_full.log 2>&1
echo "A_BENCH_FULL_done=$?"

clean_tmp
sbt -batch "runMain graft.PlanAudit" > /tmp/planaudit_r17.log 2>&1
echo "B_PLANAUDIT_done=$?"
grep '^\[info\] ' /tmp/planaudit_r17.log | sed 's/^\[info\] //' | \
  grep -v -E '^(welcome to sbt|loading |set current|running |done compiling|compiling )' > /root/repo/PLANS_r17.txt
wc -l /root/repo/PLANS_r17.txt

NEW="q_stream_ann_maintained,q_ann_ivfpq_residual,q_ann_drift_report,q_ann_ivfpq,q_ann_ivfpq_maintained,q_ann_removed,q_embed_removed,q_dedup_removed,q_astype"
for pair in "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  clean_tmp
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$NEW SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_new_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/r17_c_$tag.log 2>&1
  echo "C_${tag}_done=$?"
done

clean_tmp
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_APPENDS=8 SPARK_GRAFT_PROBE_OUT=/root/repo/BENCH_compact_r17.json \
  sbt -batch "runMain graft.tools.CompactProbe" > /tmp/r17_d_compact.log 2>&1
echo "D_compact_done=$?"

clean_tmp
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_ONLY="q_dedup_incremental_persisted,q_dedup_embed_incremental_persisted,q_ann_ivfpq_persisted,q_dedup_incremental,q_dedup_embed_incremental,q_dedup_incremental_maintained,q_dedup_embed_incremental_maintained,q_ann_ivfpq_maintained" \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_persisted_sf100.json \
  sbt -batch "runMain graft.Bench" > /tmp/r17_e_sf100adj.log 2>&1
echo "E_adjudication_done=$?"
echo "STAGE_ABCDE_COMPLETE"

# Stage F: the judge-r16 headline ask — full 1000x suite on the
# leak-fixed build, chunked, every chunk's rc recorded
python3 scripts/sf100_chunks.py /root/repo/BENCH_r17_full_local.json > /tmp/r17_chunks.txt
while read -r name n qs; do
  [ "$name" = "excluded" ] && continue
  clean_tmp
  df -h / | tail -1
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=$qs \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_sf100_$name.json \
    sbt -batch "runMain graft.Bench" > /tmp/r17_f_$name.log 2>&1
  echo "F_${name}_done=$?"
done < /tmp/r17_chunks.txt
echo "STAGE_F_COMPLETE"

# Hygiene gate (judge r16 "What's wrong" #1): nothing we spawned may
# outlive the battery. sbt -batch exits with its JVM; verify.
clean_tmp
sleep 5
LIVE=$(ps aux | grep -E "[j]ava.*graft" | grep -v "$$" | wc -l)
echo "LIVE_GRAFT_JVMS=$LIVE"
ps aux | grep -E "[j]ava" | grep -v grep || true
echo "R17_EVIDENCE_COMPLETE"
