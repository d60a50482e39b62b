package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of the per-doc checksum contribution: the first 15 hex
    * nibbles of md5(id|text) as a long. */
  private def docHash(id: Long, text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id|$text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("shardManifest accounts every doc and shard ids stay in range") {
    val docs = Tables.documents(spark, sf())
    val m = Export.shardManifest(docs, "doc_id", "text", "s42", 16)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(m.map(_._2).sum == docs.count())
    assert(m.forall(r => r._1 >= 0 && r._1 < 16))
    assert(m.forall(r => r._6 <= r._7), "min_doc must not exceed max_doc")
    // token/char totals match direct scans
    val tok = docs.select(sum(size(split(coalesce(col("text"), lit("")),
      " "))).cast("long")).as[Long].head()
    assert(m.map(_._3).sum == tok)
  }

  test("checksum is the exact XOR fold, order-independent, id-salted") {
    // shards = 1 puts everything in one manifest row; two identical
    // texts under different ids must NOT cancel out of the fold
    val rows = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
    val expected = rows.map((docHash _).tupled).reduce(_ ^ _)
    def checksumOf(data: Seq[(Long, String)], parts: Int): Long =
      Export.shardManifest(data.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", "s42", shards = 1)
        .select("checksum").as[Long].head()
    assert(checksumOf(rows, 1) == expected)
    assert(checksumOf(rows.reverse, 3) == expected,
      "fold must be partitioning/order-invariant")
    assert(expected != docHash(3L, "other"),
      "identical texts under different ids must not cancel")
  }

  test("writeShards round trip: layout re-reads to the identical manifest") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val dir = s"/tmp/graft-export-${java.util.UUID.randomUUID()}"
    try {
      Export.writeShards(docs, dir, "doc_id", "text", "s42", shards = 8)
      val back = spark.read.parquet(dir)
      // the directory's partition column agrees with a fresh assignment
      val mismatches = back.withColumn("expect",
          Export.shardCol("doc_id", "s42", 8))
        .filter(col("shard") =!= col("expect")).count()
      assert(mismatches == 0, "partition dir disagrees with shard rule")
      // and the re-read data carries the identical manifest
      val before = Export.shardManifest(docs, "doc_id", "text", "s42", 8)
        .collect().toSeq
      val after = Export.shardManifest(back.select("doc_id", "text"),
        "doc_id", "text", "s42", 8).collect().toSeq
      assert(after == before)
      // one shard directory per shard id present in the manifest
      val dirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
      assert(dirs == before.map(r => s"shard=${r.getLong(0)}").sorted)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
