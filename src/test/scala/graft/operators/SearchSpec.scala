package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, hand-checkable: "rare" appears only in doc 3; "common" in all
  private val fixture = Seq(
    (1L, "common alpha beta common"),
    (2L, "common gamma delta"),
    (3L, "rare common epsilon"),
    (4L, "zeta eta theta")
  ).toDF("doc_id", "text")

  test("bm25 ranks the rare-term doc first; no-hit docs never appear") {
    val out = Search.bm25(fixture, "doc_id", "text",
      terms = Seq("rare", "common"), k = 10)
      .select("doc_id", "n_terms_hit").as[(Long, Long)].collect().toSeq
    assert(out.head == ((3L, 2L)), s"rare+common doc must rank first: $out")
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L), "doc 4 has no hits")
  }

  test("bm25 closed-form score check (single term, Lucene idf)") {
    val out = Search.bm25(fixture, "doc_id", "text",
      terms = Seq("rare"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    // N=4, df=1, idf = ln(1 + 3.5/1.5); tf=1, dl=3, avgdl=13/4
    val idf = math.log(1 + 3.5 / 1.5)
    val expected = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / 3.25))
    assert(out.size == 1 && out.head._1 == 3L)
    assert(math.abs(out.head._2 - expected) < 1e-3,
      s"${out.head._2} vs $expected")
  }

  test("bm25 tf saturates: more repeats score higher but sub-linearly") {
    val rep = Seq(
      (1L, "term filler filler filler"),
      (2L, "term term filler filler"),
      (3L, "term term term filler")
    ).toDF("doc_id", "text")
    val scores = Search.bm25(rep, "doc_id", "text", terms = Seq("term"), k = 3)
      .select("doc_id", "score").as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2)
    assert(scores(0) < scores(1) && scores(1) < scores(2), "monotone in tf")
    assert(scores(1) - scores(0) > scores(2) - scores(1), "saturating (k1)")
  }

  test("bm25 respects k and is partitioning-invariant") {
    val docs = graft.tables.Tables.documents(spark, sf())
    val terms = Seq("spark", "vector", "customer")
    val a = Search.bm25(docs, "doc_id", "text", terms, k = 15)
      .as[(Long, Double, Long)].collect().toSeq
    assert(a.size == 15)
    val b = Search.bm25(docs.repartition(13), "doc_id", "text", terms, k = 15)
      .as[(Long, Double, Long)].collect().toSeq
    assert(a == b, "ranking must not depend on partitioning")
  }

  test("bm25 plans broadcast joins and take-ordered top-k, no full sort") {
    val docs = graft.tables.Tables.documents(spark, sf())
    val plan = Search.bm25(docs, "doc_id", "text", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not sort+limit:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "stats/df joins must broadcast")
  }

  test("hybridRrf fuses the two pools: both-pool docs beat single-pool " +
       "peers at equal ranks, and the query vector's own doc tops the " +
       "semantic pool") {
    val docs = graft.tables.Tables.documents(spark, sf())
    val emb = graft.tables.Tables.embeddings(spark, sf())
    val out = Search.hybridRrf(docs, "doc_id", "text", emb, "vec_id",
      "embedding", terms = Seq("spark", "vector", "customer"),
      queryVecId = 7L, k = 15, poolSize = 50)
      .collect()
    assert(out.length == 15)
    // descending fused score, doc_id tiebreak
    val rrfs = out.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse, s"not rank-ordered: $rrfs")
    // the query doc has cos(q,q)=1 -> sem_rank 1; with rrfK=60 a sem_rank-1
    // doc scores at least 1/61 > any single-pool doc deeper than rank 1
    val self = out.find(_.getAs[Long]("doc_id") == 7L)
    assert(self.exists(_.getAs[Int]("sem_rank") == 1),
      s"query doc must top the semantic pool: ${self}")
    // fusion property: rrf == 1/(60+lex) + 1/(60+sem) with absent = 0
    out.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Int])
      val sem = Option(r.getAs[Any]("sem_rank")).map(_.asInstanceOf[Int])
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 5e-7, s"$r")
      assert(lex.nonEmpty || sem.nonEmpty, "doc in neither pool surfaced")
    }
  }

  test("tfidfKeywords surfaces each group's characteristic term first") {
    val docs = Seq(
      (1L, "news", "shared word election election election shared"),
      (2L, "news", "election results shared word"),
      (3L, "code", "shared word compile compile compile shared"),
      (4L, "code", "compile error shared word")
    ).toDF("doc_id", "source", "text")
    val out = Search.tfidfKeywords(docs, "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Int]("rk")))
    // "election" only in news (df=1), "compile" only in code: each must
    // outrank the cross-group "shared"/"word" (df=2, lower idf)
    assert(out.contains(("news", "election", 1)), out.mkString(", "))
    assert(out.contains(("code", "compile", 1)), out.mkString(", "))
    // a term present in every group never reaches rank 1
    assert(!out.exists(t => t._2 == "shared" && t._3 == 1))
  }

  test("hybridRrf is partitioning-invariant") {
    val docs = graft.tables.Tables.documents(spark, sf())
    val emb = graft.tables.Tables.embeddings(spark, sf())
    def run(d: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      Search.hybridRrf(d, "doc_id", "text", e, "vec_id", "embedding",
        Seq("spark", "vector"), queryVecId = 3L, k = 10)
        .collect().map(_.toString).toSeq
    assert(run(docs, emb) == run(docs.repartition(11), emb.repartition(7)))
  }

  test("phrase search matches adjacency, not co-occurrence; counts " +
    "overlaps and repeated terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fast table wins"),          // one match
      (2L, "table fast"),               // terms co-occur, wrong order
      (3L, "fast x table"),             // co-occur, not adjacent
      (4L, "fast table and fast table"),// two matches
      (5L, "a a a"),                    // repeated-term phrase input below
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Search.phraseSearch(docs, "doc_id", "text",
        Seq("fast", "table")).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (4L, 2L)))
    // overlapping occurrences of a repeated-term phrase all count
    val rep = Search.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toSeq
    assert(rep == Seq((5L, 2L)))
    // three-term phrase
    val tri = Search.phraseSearch(docs, "doc_id", "text",
        Seq("fast", "table", "wins"))
      .as[(Long, Long)].collect().toSeq
    assert(tri == Seq((1L, 1L)))
  }
}
