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

  test("multi-term contains fans out per term (reference base.py:1444-1448)") {
    // one ViewFilter carrying TWO terms — the reference appends one filter
    // per term, so under the default And conjunction both must match
    val v = ViewDef("both-terms", filters = Seq(
      ViewFilter("name", "contains", Seq("red", "bolt"))),
      sorts = Nil, hiddenCols = Nil)
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L)) // NOT Set(1,2,4): term 'bolt' must not drop
  }

  test("multi-term does_not_contain fans out per term under Or") {
    val v = ViewDef("missing-either", filters = Seq(
      ViewFilter("name", "does_not_contain", Seq("red", "bolt"))),
      sorts = Nil, hiddenCols = Nil, conjunction = "Or")
    val ids = ViewCompiler.getView(tbl, v).select("id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L)) // rows lacking 'red' OR lacking 'bolt'
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

  test("registry round-trips definitions and compiles get_view by name") {
    val reg = java.nio.file.Files.createTempDirectory("graft_views").toString
    val v = ViewDef("cheap-red",
      filters = Seq(
        ViewFilter("name", "contains", Seq("red")),
        ViewFilter("price", "less", Seq(100)),
        ViewFilter("id", "is_none_of", Seq(2L, 99L))),
      sorts = Seq(("price", false)),
      hiddenCols = Seq("name"))
    ViewRegistry.save(reg, "parts", v)
    ViewRegistry.save(reg, "parts", ViewDef("all", Nil, Nil, Nil, "Or"))
    // enumeration (reference Table.views) is sorted and per-table
    assert(ViewRegistry.views(reg, "parts") == Seq("all", "cheap-red"))
    assert(ViewRegistry.views(reg, "nope").isEmpty)
    // the loaded definition is structurally identical (terms keep their
    // scalar kinds: Int arrives back as Long, which compiles identically)
    val loaded = ViewRegistry.load(reg, "parts", "cheap-red")
    assert(loaded.name == v.name && loaded.conjunction == v.conjunction)
    assert(loaded.sorts == v.sorts && loaded.hiddenCols == v.hiddenCols)
    assert(loaded.filters.map(f => (f.column, f.predicate)) ==
      v.filters.map(f => (f.column, f.predicate)))
    // get_view BY NAME equals compiling the in-memory definition
    val byName = ViewRegistry.getView(tbl, reg, "cheap-red")
    val direct = ViewCompiler.getView(tbl, v)
    assert(byName.columns.toSeq == Seq("id", "price"))
    assert(byName.collect().toSeq == direct.collect().toSeq)
    // overwrite is an update, not a duplicate
    ViewRegistry.save(reg, "parts", v.copy(hiddenCols = Nil))
    assert(ViewRegistry.load(reg, "parts", "cheap-red").hiddenCols.isEmpty)
    assert(ViewRegistry.views(reg, "parts") == Seq("all", "cheap-red"))
    // names that would escape the registry directory are rejected
    intercept[IllegalArgumentException] {
      ViewRegistry.save(reg, "parts", v.copy(name = "../evil"))
    }
    intercept[IllegalArgumentException] { ViewRegistry.load(reg, "parts", "ghost") }
  }
}
