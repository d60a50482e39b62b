package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-principal-component PCA over an embedding column — the
  * dimensionality-reduction member of the embedding family (Pearson
  * 1901; power iteration per von Mises–Geiringer). Publishes PC1's
  * per-dimension loadings and the share of total variance it explains —
  * the readout that decides whether a cheap linear projection is worth
  * shipping before ANN/clustering.
  *
  * Scale posture: the ONLY corpus-scale work is the sufficient-statistic
  * pass — per-dimension sums and the (j,k) cross-product sums, both
  * partial-agg groupBys over a scan-side double-explode fan-out (dim²
  * terms per row computed in the task, dim² ROWS shuffled total, never
  * per-pair joins). The covariance matrix is a dim²-bounded relation;
  * power iteration runs on it as dim-bounded joins, localCheckpointed
  * per round (64-row relations — the loop costs jobs, not data).
  *
  * Determinism (the pagerank discipline): every sum quantizes its terms
  * to DECIMAL(28,6) pre-sum (order-independent, ulp-proof), every
  * derived value is a fixed sequence of correctly-rounded IEEE ops
  * (sub/mul/div/sqrt), and the v₀ literal (1/√dim) is computed ONCE on
  * the driver and planted textually in both engines. With an
  * all-positive v₀ the iteration's sign is fixed; the oracle replays
  * all rounds as unrolled CTEs with every float op CAST AS DOUBLE. */
object Pca {

  /** PC1 loadings + explained-variance share. Output: one row per
    * dimension (pos, loading 6dp, ev_share 6dp). `iters` power-iteration
    * rounds (12 separates eigenvalues ~1% apart; the spec checks
    * against a dense driver reference). */
  def pc1(embeds: DataFrame, vecCol: String, iters: Int = 12): DataFrame =
    pc1Managed(embeds, vecCol, iters)._1

  /** [[pc1]] plus the cache-lifecycle handle (the Dedup.clustersManaged
    * discipline, advisor r10): the returned relation reads the final
    * iteration's localCheckpoint AND the checkpointed covariance —
    * consume it, then `cleanup()` to release both sets of blocks. */
  def pc1Managed(embeds: DataFrame, vecCol: String,
                 iters: Int = 12): (DataFrame, () => Unit) = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64], got $iters")
    val spark = embeds.sparkSession
    val D = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    // one slim head() for the v0 literal (Similarity codebook precedent)
    val dim = embeds.select(size(col(vecCol))).head().getInt(0)
    val v0 = 1.0 / math.sqrt(dim.toDouble)

    // sufficient statistics: S_j and SS_jk from one scan (two Generates,
    // no join) — C_jk = (SS_jk - S_j·S_k/n) / (n-1)
    val x = embeds.select(posexplode(col(vecCol)).as(Seq("j", "xj")),
        col(vecCol).as("__v"))
      .select(col("j"), col("xj").cast("double").as("xj"),
        posexplode(col("__v")).as(Seq("k", "xk")))
      .select(col("j"), col("k"), col("xj"),
        col("xk").cast("double").as("xk"))
    // per-dimension sums ride the same fan-out (each (row, j) appears
    // exactly once at k = 0) — no second scan
    val sums = x.filter(col("k") === 0).groupBy("j")
      .agg(sum(col("xj").cast(D)).cast("double").as("s"),
        count(lit(1)).as("n"))
    val cov = x.groupBy("j", "k")
      .agg(sum((col("xj") * col("xk")).cast(D)).cast("double").as("ss"))
      .join(broadcast(sums.select(col("j"), col("s").as("sj"), col("n"))), "j")
      .join(broadcast(sums.select(col("j").as("k"), col("s").as("sk"))), "k")
      .select(col("j"), col("k"),
        ((col("ss") - col("sj") * col("sk") / col("n")) /
          (col("n") - lit(1))).as("c"))
      .localCheckpoint()

    val trace = cov.filter(col("j") === col("k"))
      .agg(sum(col("c").cast(D)).cast("double").as("tr"))

    def multiply(v: DataFrame): DataFrame = cov
      .join(v.select(col("j").as("k"), col("v")), "k")
      .groupBy("j")
      .agg(sum((col("c") * col("v")).cast(D)).cast("double").as("w"))
    def norm(w: DataFrame, as: String): DataFrame = w.agg(
      sqrt(sum((col("w") * col("w")).cast(D)).cast("double")).as(as))

    var v = cov.select(col("j")).distinct()
      .withColumn("v", lit(v0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val w = multiply(v)
      val next = w.crossJoin(broadcast(norm(w, "nrm")))
        .select(col("j"), (col("w") / col("nrm")).as("v"))
        .localCheckpoint()
      unpersistCheckpoint(v)
      v = next
    }
    // eigenvalue = ||C·v|| at the fixpoint (v is unit)
    val lam = norm(multiply(v), "lam")
    val finalV = v
    val out = v.crossJoin(broadcast(lam)).crossJoin(broadcast(trace))
      .select(col("j").as("pos"), round(col("v"), 6).as("loading"),
        round(col("lam") / col("tr"), 6).as("ev_share"))
    (out, () => { unpersistCheckpoint(finalV); unpersistCheckpoint(cov) })
  }

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))
}
