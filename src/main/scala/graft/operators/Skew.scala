package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins (SURVEY.md §2.2 scale tooling).
  *
  * A shuffle equi-join hash-partitions BOTH sides on the join key, so a
  * hot key (one event_type carrying 40% of a 100 TB fact table) lands on
  * ONE reducer and the stage runs at the speed of that straggler. AQE's
  * skew-join handles sort-merge spill splitting, but only after the
  * skewed shuffle files exist; salting removes the hot partition at the
  * source: the big side appends a salt in [0, salts) derived from a
  * HIGH-CARDINALITY column (not the join key — salting must spread rows
  * of the SAME key), the small side is replicated once per salt value,
  * and the join runs on (key, salt). Each hot key now occupies `salts`
  * reducers; the small side grows by a bounded factor of `salts`.
  *
  * The result is provably identical to `big.join(small, keys)`: for a
  * big-side row with salt s, the replicated small side contains exactly
  * one copy of every matching row with salt s — the (key, salt) match set
  * is the (key) match set.
  *
  * Use when the dimension is too large to broadcast AND the fact side's
  * key histogram is skewed; a broadcastable dimension needs no salt (the
  * join never shuffles the fact side at all).
  */
object Skew {

  /** Salted inner equi-join of `big` (skewed keys) with `small`
    * (replicated `salts`×). `saltSrcCol` must be a high-cardinality
    * big-side column (a row id); the salt is a pure function of it, so
    * the result is deterministic under any partitioning. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSrcCol: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(keys.nonEmpty, "keys must be non-empty")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(saltSrcCol)), lit(salts)).cast("int"))
    val replSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replSmall, keys :+ "__salt").drop("__salt")
  }
}
