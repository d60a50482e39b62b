package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate: gates, exact dedup and near-dup dedup compose") {
    val d1 = (1 to 60).map(i => s"w${i % 9}").mkString(" ")
    val nearD1 = { val w = d1.split(" "); w(5) = "zzz"; w.mkString(" ") }
    val docs = Seq(
      (1L, d1),
      (2L, d1),              // exact dup of 1 -> dropped
      (3L, nearD1),          // near dup of 1 -> dropped
      (4L, "short text"),    // < minTokens -> dropped
      (5L, (1 to 60).map(i => s"q${i % 7}").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Curation.curate(docs, "doc_id", "text", minTokens = 10,
        nearDupTau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("curateDecontaminated additionally strips eval-overlapping docs") {
    val docs = Tables.documents(spark, sf())
      .withColumn("text", coalesce(col("text"), lit("")))
    val bench = docs.filter(col("doc_id") % 11 === 0)
    val curated = Curation.curate(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val decon = Curation.curateDecontaminated(docs, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(decon.subsetOf(curated), "decontamination only removes rows")
    // any kept benchmark doc with >= w tokens is a verbatim self-overlap
    // and must be gone
    val leakedKept = curated.filter(_ % 11 == 0)
    val longBench = bench
      .filter(regexp_count(col("text"), lit("\\S+")) >= 5)
      .select("doc_id").as[Long].collect().toSet
    assert(leakedKept.intersect(longBench).forall(!decon.contains(_)),
      "curated docs that are verbatim benchmark docs must be stripped")
  }

  test("curate on sf0.001 documents keeps a sane fraction with fingerprints") {
    val docs = Tables.documents(spark, sf())
    val out = Curation.curate(docs, "doc_id", "text")
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    assert(out.filter(col("fp_md5").isNull).count() == 0)
  }

  test("near-dup anti-join is a broadcast join in the static plan") {
    val docs = Tables.documents(spark, sf())
    val plan = Curation.curate(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the loser set must broadcast: a SortMergeJoin LeftAnti would
    // exchange+sort the whole curated corpus at 100 TB
    val lines = plan.linesIterator.toSeq
    assert(lines.exists(l => l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"anti-join not broadcast:\n$plan")
    assert(!lines.exists(l => l.contains("SortMergeJoin") && l.contains("LeftAnti")),
      "anti-join fell back to sort-merge")
  }

  test("broadcast size-gate: oversized loser sets drop the broadcast HINT") {
    val docs = Tables.documents(spark, sf())
    // threshold 0 forces the fallback: no hint in the plan, so the
    // size-based planner/AQE decides (it may still pick broadcast for a
    // genuinely small side — the point is the FORCED hint is gone and a
    // huge loser set can degrade to SMJ instead of an OOM)
    val gated = Curation.curate(docs, "doc_id", "text", maxBroadcastLosers = 0L)
    assert(!gated.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "size gate ignored — broadcast hint still present")
    assert(Curation.curate(docs, "doc_id", "text")
      .queryExecution.analyzed.toString.contains("ResolvedHint"),
      "default path lost its broadcast hint")
    val kept = gated.select("doc_id").as[Long].collect().toSet
    val keptBroadcast = Curation.curate(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == keptBroadcast, "join strategy changed the result")
  }

  test("curateManaged: cleanup unpersists the loser cache after materialization") {
    val docs = Tables.documents(spark, sf())
    // earlier tests in this suite persist the same loser plan and leave it
    // to LRU; clear so the lifecycle assertion sees only this call's cache
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (plan, cleanup) = Curation.curateManaged(docs, "doc_id", "text")
    assert(plan.count() > 0) // materialize — the loser cache fills here
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "loser set was never persisted")
    cleanup()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"cache leaked after cleanup: $after")
  }

  test("frameSample bounds fan-out and preserves bytes") {
    val docs = Tables.documents(spark, sf()).limit(10)
    val media = Multimodal.asBinary(docs, "doc_id", "text")
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"),
        col("meta.media_type").as("media_type"))
      .filter(col("payload").isNotNull)
      .as[Multimodal.MediaRow]
    val frames = Multimodal.frameSample(media, frameSize = 16, stride = 64,
      maxFrames = 5).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.doc_id).values.forall(_.length <= 5))
    assert(frames.forall(_.frame.length <= 16))
    val resized = Multimodal.resizeFeatures(
      Multimodal.stubDecode(media, featDim = 8), outDim = 4).collect()
    assert(resized.forall(_.feature.length == 4))
  }
}
