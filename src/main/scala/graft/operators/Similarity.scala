package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.2).
  *
  * Scale posture: the query side is always tiny → broadcast; the corpus is
  * scanned once. Brute-force top-k is the exactness baseline; `annLsh`
  * (random-hyperplane signatures → band-bucketed candidates) is the path
  * that survives a 10^9-vector corpus, because candidates come from an
  * equi-join on band hashes instead of a full cross product.
  */
object Similarity {

  /** Deterministic dot product: left-fold in array order with a double
    * accumulator (graft's native codegen'd VecDot Expression). Same op
    * sequence as DuckDB's list_dot_product, so results are bit-identical
    * to the oracle (verified empirically) — threshold and top-k
    * comparisons then agree exactly across engines. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)

  /** Cosine similarity over array<double> columns:
    * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query with a window, keep k. The window shuffles by
    * query id — k·|queries| rows survive. Self-matches excluded. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val e = emb.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.join(broadcast(q), col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: partition the corpus into `nlist` cells around coarse
    * centroids, probe the `nprobe` nearest cells per query, rank
    * candidates by exact cosine. The centroid set here is a deterministic
    * sample (lowest ids) standing in for a k-means codebook — the
    * assignment/probe plumbing (the Spark-side shape) is what matters:
    * corpus assignment is a scan-side argmax over the codebook, candidates
    * come from an equi-join on cell id, so a query touches ~nprobe/nlist
    * of the corpus instead of all of it.
    * Centroids are collected to the driver — bounded at nlist×dim floats,
    * the IVF codebook is driver-resident by construction (like any
    * broadcast). The codebook rides into tasks as ONE reference object of
    * the native `vec_mat_cosines` Expression — nlist literal-array
    * expressions would cost seconds of Janino compile per plan (measured
    * 5.6s at sf0.1) for the same semantics. */
  def annIvf(emb: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int,
             nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val e = emb.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val codebook: Array[Array[Double]] = e.orderBy("vid").limit(nlist)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    def withSims(df: DataFrame) = df.withColumn("sims",
      graft.functions.GraftFunctions.vec_mat_cosines(col("v"), codebook))
    val corpus = withSims(e)
      .withColumn("cell", expr("array_position(sims, array_max(sims))").cast("int"))
      .drop("sims")
    val probes = withSims(e.filter(col("vid").isin(queryIds: _*)))
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"),
        posexplode(col("sims")).as(Seq("cellIdx", "sim")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("cellIdx"))))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnrm"),
        (col("cellIdx") + 1).as("cell"))
    val cand = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("vid") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("vid").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Sign-random-projection signature (Charikar SRP-LSH) — native codegen'd
    * Expression (graft.functions.SrpSignature): hyperplane components are
    * hash-derived per (seed, plane, index), so there is no dim-sized
    * literal in the plan and no driver job to probe the vector dimension.
    * Angular locality: P[bit agrees] = 1 - θ/π. */
  def srpSignature(v: Column, numPlanes: Int, seed: Long = 0L): Column =
    graft.functions.GraftFunctions.srp_signature(v, numPlanes, seed)

  /** LSH-bucketed approximate top-k: 16-bit SRP signatures split into 4
    * bands of 4 bits; corpus vectors sharing any band with a query vector
    * are candidates; exact cosine ranks candidates, window keeps k.
    * The candidate step is an equi-join on (band, 4-bit value) — shuffle
    * carries (id, band hash) only, never the cross product. */
  def annLsh(emb: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int,
             numPlanes: Int = 16, bands: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val bits = numPlanes / bands
    val mask = (1L << bits) - 1
    val e = emb.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"),
      srpSignature(col(vecCol).cast("array<double>"), numPlanes).as("sig"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val banded = e.select(col("vid"), col("v"), col("nrm"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * bits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bv")))
    val q = banded.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"),
        col("band"), col("bv"))
    val cand = banded.join(broadcast(q),
        Seq("band", "bv"))
      .filter(col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"), col("qv"), col("qnrm"),
        col("v"), col("nrm"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }
}
