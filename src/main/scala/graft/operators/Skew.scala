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

  /** Key-distribution diagnostics — the report that DECIDES whether a
    * column needs [[saltedJoin]]/AQE skew handling before a 100 TB
    * shuffle keys on it: per candidate column, the row count, distinct
    * count, Shannon entropy (nats), the hottest value and its share.
    * top_share ≈ 1/n_distinct and entropy ≈ ln(n_distinct) mean uniform
    * keys; top_share ≫ 1/n_distinct is the straggler warning.
    *
    * ONE scan for all columns: `stack` melts the projected columns to
    * (col_name, val) rows, a partial-aggregated groupBy counts each
    * value, and ONE second aggregation folds each column's histogram to
    * its report row — entropy comes from the identity
    * H = ln(n) − (Σ c·ln c)/n, whose Σ c·ln c and n = Σ c both reduce in
    * the same pass (a p·ln p formulation would need the totals first —
    * a second scan). The c·ln c terms quantize to DECIMAL(28,6) before
    * the order-independent sum (lm_perplexity discipline: a last-ulp
    * libm ln difference dies in the quantization → bit-stable across
    * engines and partitionings), and the hottest value rides as a
    * map-side-combinable max(struct(c, val)) — a 10⁹-distinct join-key
    * column never serializes into one window task. */
  def skewReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "skewReport needs at least one column")
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val stackArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
    val melted = df.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col_name, val)"))
    val counts = melted.groupBy("col_name", "val").agg(count(lit(1)).as("c"))
    val cd = col("c").cast("double")
    counts.groupBy("col_name")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum((cd * log(cd)).cast(Dec)).as("__clnc"),
        max(struct(col("c"), col("val"))).as("__top"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        round(log(col("n").cast("double")) -
          col("__clnc").cast("double") / col("n"), 6).as("entropy"),
        col("__top.val").as("top_value"),
        round(col("__top.c").cast("double") / col("n"), 6).as("top_share"))
  }
}
