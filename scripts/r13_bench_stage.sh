#!/bin/bash
# Round-13 bench pipeline:
#  A. full quiet sf0.1 suite (218 rows) -> the r13 anchor (ask #4)
#  B. the 8 new rows at sf1 / sf10 / sf100 (four-decade story)
#  C. full sf100 suite in chunks from the anchor (ask #3), merged later
set -x
cd /root/repo
NEW="q_stream_hostquota,q_line_dedup,q_dedup_spans_varlen,q_wordpiece_byte_encode,q_unigram_byte_encode,q_html_extract,q_crawl_funnel_html,q_dedup_incremental_persisted,q_dedup_incremental"
# A: full sf0.1 anchor
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_sf01_full.json \
  sbt -batch "runMain graft.Bench" > /tmp/r13_a_full.log 2>&1
echo "A_done=$?"
# B: new rows per decade
for pair in "/root/repo/target/sf1:sf1:32g" "/root/repo/target/sf10:sf10:64g" "/root/repo/target/sf100:sf100:96g"; do
  dir="${pair%%:*}"; rest="${pair#*:}"; tag="${rest%%:*}"; mem="${rest#*:}"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    SPARK_GRAFT_BENCH_ONLY=$NEW SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_new_$tag.json \
    sbt -batch "runMain graft.Bench" > /tmp/r13_b_$tag.log 2>&1
  echo "B_${tag}_done=$?"
done
echo "stageAB_complete"
