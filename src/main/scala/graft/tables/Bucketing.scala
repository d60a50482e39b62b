package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the storage-side half of shuffle avoidance
  * (SURVEY.md §2.2 scale tooling).
  *
  * A shuffle join moves BOTH sides across the network every time it
  * runs. Bucketing moves that cost to WRITE time, once: each side is
  * hash-partitioned into `buckets` files by the join key and
  * sorted within buckets, so a later equi-join on that key reads
  * co-partitioned, pre-sorted inputs and Catalyst plans a sort-merge
  * join with NO Exchange on either side (and no per-partition sort when
  * `sortBy` matches). At 100 TB this is the difference between "every
  * nightly join reshuffles the fact table" and "the fact table was laid
  * out for its join key when it was ingested" — the same trick lets
  * repeated groupBy on the bucket key skip its Exchange too.
  *
  * The reference has no storage layout control (tables live server-side,
  * base.py:61); this is Spark-native scale surface. Bucket counts should
  * be sized so one bucket ≈ one task's worth of data (128–512 MB);
  * both join sides must use the SAME bucket count (or a multiple, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key; with matching
    * bucket counts the physical plan carries no ShuffleExchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Hive-style DIRECTORY partitioning — the pruning-side half of the
    * layout story (bucketing kills the join shuffle; partitioning kills
    * the SCAN): rows land in `path/<col>=<value>/` directories, and a
    * later filter on the partition column prunes whole directories at
    * PLANNING time (`PartitionFilters` in the scan node) — the bytes of
    * non-matching partitions are never opened, unlike a row-group
    * `PushedFilters` which still reads footers. The 100 TB convention:
    * partition by the coarse always-filtered dimensions (date, lang,
    * source — low cardinality, or the small-files problem replaces the
    * scan problem), bucket by the high-cardinality join key. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.format("parquet").mode("overwrite")
      .partitionBy(partitionCols: _*).save(path)
  }
}
