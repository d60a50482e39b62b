package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Diagnostic main: dump formatted physical plans for the headline queries
  * so scan pushdown (PushedFilters), column pruning (ReadSchema), join
  * strategies (BroadcastHashJoin vs SortMergeJoin) and codegen spans can be
  * audited per round. Usage: runMain graft.PlanAudit [sfDir] [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // default: the heaviest bench queries plus the joins whose strategy
    // past verdicts asked to prove (PLANS_r{N}.txt source of truth)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q3_topk", "q_filter_cmp", "q_link_join",
        "q_linked_rollup_sum", "q_text_langid", "q_stats_quantiles",
        "q_query_sql", "q_curation_pipeline", "q_dedup_ngram",
        "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embed_lsh", "q_ann_topk", "q_ann_ivf",
        "q_ann_lsh", "q_asof_join", "q_asof_join_sharded", "q_range_join", "q_multimodal_decode",
        "q_events_sessionize", "q_decontaminate", "q_pack_sequences",
        "q_sample_bernoulli", "q_multimodal_frames", "q_distinct_sketch_check",
        "q_dedup_cluster_best", "q_mixture_weights", "q_multimodal_features",
        "q_curation_decontaminated", "q_shared_spans", "q_dedup_paragraphs",
        "q_text_repetition", "q_epoch_shuffle", "q_redaction",
        "q_decontaminate_hashfilter", "q_lm_perplexity", "q_search_bm25",
        "q_dedup_incremental", "q_events_rolling", "q_events_deltas",
        "q_join_salted", "q_heavy_hitters", "q_sample_temperature",
        "q_agg_rollup", "q_pivot_events", "q_percent_rank",
        "q_upsert_latest", "q_ann_pq", "q_count_distinct_check",
        "q_events_funnel", "q_events_retention", "q_split_assign",
        "q_text_chunks", "q_events_props", "q_stats_corr", "q_winsorize",
        "q_events_anomalies", "q_describe", "q_embed_centroids",
        "q_embed_classify", "q_text_normalize")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(f) => println(f(spark, sfDir).queryExecution.explainString(FormattedMode))
        case None => println(s"unknown query '$n'")
      }
    }
    spark.stop()
  }
}
