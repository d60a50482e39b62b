package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Join strategies for hostile key distributions at scale (SURVEY.md §4).
  *
  * AQE's skew-join split handles moderate skew automatically; these are
  * the explicit tools for when the planner can't: salting for a fact side
  * with pathological hot keys, and bucketing for repeated co-located
  * fact-fact joins.
  */
object Joins {

  /** Salted equi-join: spread each hot fact key over `salts` shuffle
    * partitions by appending a salt to the join key; the (small) dim side
    * is exploded ×salts so every salted fact row still meets its match.
    * Result set is identical to a plain equi-join — only the shuffle
    * distribution changes. Use when one key holds a double-digit share of
    * the fact table; cost is salts× the dim shuffle size. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int, how: String = "inner"): DataFrame = {
    require(salts > 0)
    // dim rows exist once per salt copy: an unmatched dim row under a
    // right/full outer join would surface `salts` times — only
    // fact-preserving join types keep the plain-join result set
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(how.toLowerCase.replace("_", "")),
      s"saltedJoin supports fact-preserving join types only, got '$how'")
    // deterministic spread: hash of the whole fact row modulo salts
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim,
        saltedFact(factKey) === explodedDim(dimKey) &&
          saltedFact("__salt") === explodedDim("__salt"), how)
      .drop("__salt")
  }

  /** Write both sides bucketed by their join keys so subsequent joins are
    * shuffle-free (bucket-local sort-merge). The 100 TB pattern for a fact
    * table joined repeatedly on the same key — pay one shuffle at write
    * time, none per query. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
