package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ViewSpec extends SparkSpec {
  import spark.implicits._

  private def tbl = Table(Seq(
    (1L, "red bolt", 5.0), (2L, "red nut", 50.0),
    (3L, "blue bolt", 500.0), (4L, "red bolt deluxe", 5000.0)
  ).toDF("id", "name", "price"), "parts")

  test("repeated same-predicate filters on one column all apply (AND)") {
    val v = ViewDef("both-words", filters = Seq(
      ViewFilter("name", "contains", Seq("red")),
      ViewFilter("name", "contains", Seq("bolt"))),
      sorts = Nil, hiddenCols = Nil)
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L)) // must contain BOTH 'red' and 'bolt'
  }

  test("range via two bounds on one column applies both") {
    val v = ViewDef("band", filters = Seq(
      ViewFilter("price", "greater", Seq(10)),
      ViewFilter("price", "less", Seq(1000)),
      ViewFilter("price", "greater", Seq(100))),  // tighter lower bound
      sorts = Nil, hiddenCols = Nil)
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("Or conjunction combines filter groups with OR (reference base.py:1453)") {
    val v = ViewDef("either", filters = Seq(
      ViewFilter("name", "contains", Seq("nut")),
      ViewFilter("price", "greater", Seq(1000))),
      sorts = Nil, hiddenCols = Nil, conjunction = "Or")
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(2L, 4L)) // 'nut' OR price>1000 — AND would give none
  }

  test("Or conjunction still merges same-column is-terms into any_of first") {
    val v = ViewDef("merge-or", filters = Seq(
      ViewFilter("name", "is", Seq("red bolt")),
      ViewFilter("name", "is", Seq("blue bolt")),
      ViewFilter("price", "greater", Seq(4000))),
      sorts = Nil, hiddenCols = Nil, conjunction = "Or")
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L))
  }

  test("unknown conjunction is rejected") {
    val v = ViewDef("bad", filters = Seq(ViewFilter("name", "is", Seq("x"))),
      sorts = Nil, hiddenCols = Nil, conjunction = "Xor")
    intercept[IllegalArgumentException] { ViewCompiler.getView(tbl, v) }
  }

  test("is/is_not merging still groups into any_of/none_of") {
    val v = ViewDef("merge", filters = Seq(
      ViewFilter("name", "is", Seq("red bolt")),
      ViewFilter("name", "is", Seq("red nut"))),
      sorts = Nil, hiddenCols = Nil)
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L)) // is + is merges to is_any_of (OR), per reference
  }
}
