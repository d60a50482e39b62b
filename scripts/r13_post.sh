#!/bin/bash
# Round-13 post-pipeline: retry the four ENOSPC-failed sf100 rows with
# maximal free disk (two groups, stale spill dirs cleaned between JVMs),
# then the stage-F decade refreshes.
set -x
cd /root/repo
clean_disk() {
  rm -rf /root/repo/spark-warehouse /tmp/blockmgr-* /tmp/spark-[0-9a-f]*
  df -h / | tail -1
}

clean_disk
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=q_dedup_minhash,q_dedup_minhash_recall \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_retry1.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_retry1.log 2>&1
echo "retry1_done=$?"

clean_disk
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_ONLY=q_dedup_embed_lsh,q_graph_triangles_sampled \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf100_retry2.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_retry2.log 2>&1
echo "retry2_done=$?"

clean_disk
bash /root/repo/scripts/r13_stage_f.sh
echo "post_complete"
