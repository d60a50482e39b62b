#!/bin/bash
# Round-12 evidence benches: full sf0.1 refresh + the 20 new rows at the
# three scaled decades. Run AFTER target/sf100 exists.
set -x
cd /root/repo
NEW20="q_corpus_datacard,q_decontaminate_cut,q_dedup_spans_cut,q_export_manifest,q_fim_transform,q_mixture_take,q_mixture_take_rate,q_span_corrupt,q_stream_tokenize,q_tokenizer_report,q_wordpiece_encode,q_c4_line_filter,q_c4_report,q_url_canonical,q_url_dedup,q_domain_cap,q_sft_render,q_sft_masks,q_quality_sweep,q_length_buckets"

# 1. FULL fresh sf0.1 anchor (all 202 rows)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf01_full.json \
  sbt -batch "runMain graft.Bench" > /tmp/ev4_bench01.log 2>&1
echo bench01_done=$?

# 2. sf1 (10x) subset
SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_BENCH_ONLY=$NEW20 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_new.json \
  sbt -batch "runMain graft.Bench" > /tmp/ev5_bench1.log 2>&1
echo bench1_done=$?

# 3. sf10 (100x) subset
SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_ONLY=$NEW20 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10_new.json \
  sbt -batch "runMain graft.Bench" > /tmp/ev6_bench10.log 2>&1
echo bench10_done=$?

# 4. sf100 (1000x) subset
SPARK_GRAFT_SF_DIR=/root/repo/target/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=96g SPARK_GRAFT_BENCH_ONLY=$NEW20 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf100_new.json \
  sbt -batch "runMain graft.Bench" > /tmp/ev7_bench100.log 2>&1
echo bench100_done=$?
