package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableSpec extends SparkSpec {
  import spark.implicits._

  private def tbl = Table(Seq(
    (1L, "alice", "A", 10.0),
    (2L, "bob", "B", 20.0),
    (3L, "carol", "", 30.0),
    (4L, null.asInstanceOf[String], "A", 40.0)
  ).toDF("id", "name", "tag", "score"), "t")

  test("loc filters and projects") {
    val t = tbl
    val out = t.loc(t("score") >= 20 && t("tag") === "A", Seq("id")).df.collect()
    assert(out.map(_.getLong(0)).toSet == Set(4L))
  }

  test("empty-string-as-null text semantics (reference note 5)") {
    val t = tbl
    assert(t.loc(t("name").isnull()).df.collect().map(_.getLong(0)).toSet == Set(4L))
    assert(t.loc(t("tag").isnull()).df.count() == 1) // "" counts as null
    assert(t.loc(t("tag").notnull()).df.count() == 3)
  }

  test("mapValues: unmapped -> null (pandas map semantics)") {
    val t = tbl
    val out = t.df.select(t("tag").mapValues(Seq("A" -> "x")).as("m"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.count(_.contains("x")) == 2 && out.count(_.isEmpty) == 2)
    // empty mapping -> all null, like pandas .map({})
    val empty = t.df.select(t("tag").mapValues(Seq.empty).as("m"))
      .collect().map(r => r.isNullAt(0))
    assert(empty.forall(identity))
  }

  test("bundle: N queued edits commit as ONE staged projection " +
       "(BundleEdits analog), last write wins per column") {
    val t = tbl
    def projCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
      }.size
    val baseProj = projCount(t.df)
    // chained edits: one lineage step (Project) per call
    val chained = t.set("score", col("score") * 2)
      .setWhere(col("tag") === "A", "tag", lit("aa"))
      .set("grade", lit("g"))
    assert(projCount(chained.df) == baseProj + 3,
      "chained set/setWhere must add one Project per edit")
    // bundled: the same edits, ONE Project total
    val bundled = t.bundle()
      .set("score", col("score") * 2)
      .setWhere(col("tag") === "A", "tag", lit("aa"))
      .set("grade", lit("g"))
      .commit()
    assert(projCount(bundled.df) == baseProj + 1,
      "a committed bundle must be a single staged projection")
    // identical results
    assert(bundled.df.orderBy("id").collect().toSeq ==
      chained.df.orderBy("id").collect().toSeq)
    // same-column edits compose in queue order, later value winning —
    // the reference's same-row merge rule
    val lww = t.bundle()
      .setWhere(col("id") <= 2, "tag", lit("x"))
      .setWhere(col("id") === 2, "tag", lit("y"))
      .commit()
    val tags = lww.df.orderBy("id").select("tag").collect().map(_.getString(0))
    assert(tags.toSeq == Seq("x", "y", "", "A"))
    // empty bundle is the identity
    assert(t.bundle().commit().df.schema == t.df.schema)
    // advisor r11: 5+ NEW columns append in QUEUE order, not hash-map
    // iteration order (which is arbitrary across Scala versions)
    val wide = t.bundle()
      .set("n1", lit(1)).set("n2", lit(2)).set("n3", lit(3))
      .set("n4", lit(4)).set("n5", lit(5)).set("n6", lit(6))
      .set("n7", lit(7))
      .commit()
    assert(wide.df.columns.takeRight(7).toSeq ==
      Seq("n1", "n2", "n3", "n4", "n5", "n6", "n7"),
      s"new columns must append in queue order, got ${wide.df.columns.toSeq}")
  }

  test("setWhere rewrites only masked rows") {
    val t = tbl
    val out = t.setWhere(col("score") > 25, "tag", lit("HI"))
      .df.select("tag").as[String].collect()
    assert(out.count(_ == "HI") == 2)
  }

  test("updateChanged emits only changed cells, null-safe") {
    val t = tbl
    val changes = t.updateChanged("id", "tag", lit("A")).collect()
    // rows 2 (B->A) and 3 (""->A) change; 1 and 4 already A
    assert(changes.map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("append keeps target columns only") {
    val t = tbl
    val other = Table(Seq((9L, "zed", "Z", 1.0, true))
      .toDF("id", "name", "tag", "score", "extra"), "o")
    val appended = t.append(other)
    assert(appended.df.columns.toSeq == Seq("id", "name", "tag", "score"))
    assert(appended.df.count() == 5)
  }

  test("TableIO round-trip: csv/json in, parquet save, reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val t = tbl
    t.df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    t.df.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = TableIO.fromCsv(spark, s"$dir/csv", "t_csv")
    assert(fromCsv.df.count() == t.df.count())
    // inference recovers numeric/boolean dtypes, not just strings
    assert(fromCsv.df.schema("id").dataType.typeName != "string")
    val fromJson = TableIO.fromJson(spark, s"$dir/json", "t_json")
    assert(fromJson.df.count() == t.df.count())
    fromCsv.save(s"$dir/pq", partitionBy = Seq("tag"))
    val back = TableIO.fromParquet(spark, s"$dir/pq", "t_back")
    assert(back.df.count() == t.df.count())
    assert(TableIO.fromFrame(t.df, "t2").name == "t2")
    // ORC round-trip with pushdown intact
    t.df.write.mode("overwrite").orc(s"$dir/orc")
    val fromOrc = TableIO.fromOrc(spark, s"$dir/orc", "t_orc")
    assert(fromOrc.df.count() == t.df.count())
    val pushed = fromOrc.df.filter(col("id") > 2)
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("id"))
  }

  test("containsValue: 'value in column' existence probe (base.py:1782)") {
    val t = tbl
    assert(t.containsValue("name", t.df.select("name").head().getString(0)))
    assert(!t.containsValue("name", "no-such-name"))
    assert(!t.containsValue("id", -1L))
  }

  test("containsOption: multi-select membership (reference base.py:1946)") {
    val t = Table(Seq(
      (1L, Seq("red", "blue")), (2L, Seq("green")), (3L, Seq.empty[String])
    ).toDF("id", "labels"), "t")
    val hit = t.loc(t("labels").containsOption("blue")).df
      .select("id").as[Long].collect().toSet
    assert(hit == Set(1L))
  }

  test("frame parity: addColumn/clear/dropColumn/rename/dtypes/shape") {
    val t = tbl
    assert(t.addColumn("z", lit(0)).columnNames.contains("z"))
    val cleared = t.clear("score")
    assert(cleared.df.schema("score").dataType.typeName == "double")
    assert(cleared.df.filter(col("score").isNotNull).count() == 0)
    assert(!t.dropColumn("tag").columnNames.contains("tag"))
    assert(t.rename("tag", "label").columnNames.contains("label"))
    assert(t.shape == (4L, 4))
    assert(t.dtypes.toMap.apply("id").toLowerCase.contains("long"))
  }

  test("save writes partitioned parquet that prunes on read") {
    val t = tbl
    val out = s"/tmp/graft-save-${java.util.UUID.randomUUID()}"
    t.save(out, partitionBy = Seq("tag"))
    val back = spark.read.parquet(out).filter(col("tag") === "A")
    assert(back.count() == 2)
    // partition pruning: only the tag=A directory is read
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || back.inputFiles.forall(_.contains("tag=A")))
  }

  test("save format parity: orc/csv/json round-trip through TableIO") {
    val t = tbl
    val base = s"/tmp/graft-fmt-${java.util.UUID.randomUUID()}"
    t.save(s"$base/orc", format = "orc")
    assert(TableIO.fromOrc(spark, s"$base/orc", "t").df.count() == 4)
    t.save(s"$base/csv", format = "csv")
    val csvBack = TableIO.fromCsv(spark, s"$base/csv", "t")
    assert(csvBack.df.count() == 4 &&
      csvBack.columnNames.toSet == t.columnNames.toSet)
    t.save(s"$base/json", format = "json")
    assert(TableIO.fromJson(spark, s"$base/json", "t").df.count() == 4)
    intercept[IllegalArgumentException](t.save(s"$base/x", format = "avro"))
  }

  test("ilocSlice: negative bounds map through row count, step post-slices") {
    val df = (0L until 100L).toDF("id")
    val t = Table(df, "seq")
    def ids(out: org.apache.spark.sql.DataFrame): Seq[Long] =
      out.collect().map(_.getLong(0)).toSeq
    // [-10:] -> last 10 rows
    assert(ids(t.ilocSlice(Some(-10L), None, 1, col("id"))) == (90L until 100L))
    // [5:-90] -> rows 5..9 (stop = n - 90 = 10)
    assert(ids(t.ilocSlice(Some(5L), Some(-90L), 1, col("id"))) == (5L until 10L))
    // [-20:-10:4] -> 80, 84, 88 (step within the window)
    assert(ids(t.ilocSlice(Some(-20L), Some(-10L), 4, col("id"))) == Seq(80L, 84L, 88L))
    // [::7] with open bounds
    assert(ids(t.ilocSlice(None, None, 7, col("id"))) == (0L until 100L by 7))
    // negative start larger than n clamps to 0
    assert(ids(t.ilocSlice(Some(-1000L), Some(3L), 1, col("id"))) == (0L until 3L))
    intercept[IllegalArgumentException] { t.ilocSlice(None, None, -1, col("id")) }
    intercept[IllegalArgumentException] { t.ilocSlice(None, None, 2) } // no order
    // bounds past Int.MaxValue must fail loudly, not wrap through .toInt
    intercept[IllegalArgumentException] {
      t.ilocSlice(Some(Int.MaxValue + 1L), None, 1, col("id"))
    }
    intercept[IllegalArgumentException] {
      t.ilocSlice(Some(0L), Some(Int.MaxValue + 10L), 1, col("id"))
    }
  }

  test("astype errors policy: raise throws on bad values, ignore reverts") {
    import org.apache.spark.sql.types.LongType
    val t = Table(Seq((1L, "12"), (2L, "34"), (3L, "oops")).toDF("id", "s"), "c")
    // raise: execution fails on the unconvertible row
    val ex = intercept[Exception] {
      t.astype("s", LongType, errors = "raise").df.collect()
    }
    assert(ex.getMessage.contains("oops") || ex.getCause != null)
    // ignore: pandas all-or-nothing — column comes back UNCHANGED
    val kept = t.astype("s", LongType, errors = "ignore")
    assert(kept.df.schema("s").dataType.typeName == "string")
    // clean column: ignore casts normally
    val clean = Table(Seq((1L, "12"), (2L, "34")).toDF("id", "s"), "c2")
      .astype("s", LongType, errors = "ignore")
    assert(clean.df.schema("s").dataType == LongType)
    // raise on a clean column behaves like a plain cast
    assert(Table(Seq((1L, "7")).toDF("id", "s"), "c3")
      .astype("s", LongType).df.collect()(0).getLong(1) == 7L)
    intercept[IllegalArgumentException] { t.astype("s", LongType, "bogus") }
  }

  test("mapValues na_action: None maps null keys, 'ignore' propagates") {
    val t = tbl
    // na_action=None with a null mapping key: the null name maps
    val m0 = t.df.select(t("name").mapValues(
        Seq[(Any, Any)]("alice" -> "A", (null, "N/A"))).as("m"))
      .collect().map(r => Option(r.getString(0)))
    assert(m0.count(_.contains("N/A")) == 1)
    // na_action='ignore': nulls propagate, null keys skipped
    val m1 = t.df.select(t("name").mapValues(
        Seq[(Any, Any)]("alice" -> "A", (null, "N/A")), naAction = Some("ignore")).as("m"))
      .collect().map(r => Option(r.getString(0)))
    assert(m1.count(_.contains("N/A")) == 0 && m1.count(_.isEmpty) == 3)
    intercept[IllegalArgumentException] {
      t.df.select(t("name").mapValues(Seq("a" -> "b"), Some("bogus")))
    }
  }

  test("addLinkedColumn rollups pre-aggregate before join") {
    val t = tbl
    val orders = Table(Seq((1L, 5.0), (1L, 7.0), (2L, 1.0))
      .toDF("cust", "amt"), "orders")
    val sum = t.addLinkedColumn(orders, "id", "cust", "amt", "rollup-sum", "s")
      .df.select("id", "s").as[(Long, Option[Double])].collect().toMap
    assert(sum(1L).contains(12.0) && sum(2L).contains(1.0) && sum(3L).isEmpty)
    val luk = t.addLinkedColumn(orders, "id", "cust", "amt", "lookup", "l")
      .df.select("id", "l").as[(Long, Option[String])].collect().toMap
    assert(luk(1L).contains("5.0,7.0"))
    intercept[IllegalArgumentException] {
      t.addLinkedColumn(orders, "id", "cust", "amt", "bogus", "x")
    }
  }

  test("describe: one scan, sample std, null-safe degenerate columns") {
    val t = Table(Seq(
      (1.0, Option(2.0), Option.empty[Double]),
      (2.0, Option(2.0), Option.empty[Double]),
      (3.0, Option.empty[Double], Option.empty[Double]))
      .toDF("a", "b", "allnull"), "x")
    val d = t.describe(Seq("a", "b", "allnull"))
    // exactly TWO scans regardless of column count: one codegen'd moment
    // aggregate + one percentile-only aggregate (fusing them would force
    // the whole aggregate onto the interpreted ObjectHashAggregate path)
    val plan = d.queryExecution.executedPlan.toString
    val scans = "(?i)(localtablescan|scan parquet)".r.findAllIn(plan).size
    assert(scans == 2, s"describe must be TWO scans (moments + quartiles), got $scans:\n$plan")
    val rows = d.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getLong(1) == 3 && rows("a").getLong(2) == 0)
    assert(rows("a").getDouble(3) == 2.0)          // mean
    assert(rows("a").getDouble(4) == 1.0)          // sample std of 1,2,3
    assert(rows("b").getLong(1) == 2 && rows("b").getLong(2) == 1)
    assert(rows("b").getDouble(4) == 0.0)          // zero variance, n>1
    assert(rows("allnull").getLong(1) == 0)
    assert(rows("allnull").isNullAt(3) && rows("allnull").isNullAt(4),
      "all-null column must yield null mean/std, not ANSI /0")
    // pandas-parity quartile rows: linear-interpolated exact percentiles
    assert(rows("a").getDouble(6) == 1.5 &&        // p25 of 1,2,3
      rows("a").getDouble(7) == 2.0 &&             // p50
      rows("a").getDouble(8) == 2.5)               // p75
    assert(rows("b").getDouble(6) == 2.0 && rows("b").getDouble(7) == 2.0 &&
      rows("b").getDouble(8) == 2.0)               // constant column
    assert(rows("allnull").isNullAt(6) && rows("allnull").isNullAt(7) &&
      rows("allnull").isNullAt(8),
      "all-null column must yield null quartiles")
  }

  test("describe: constant column std is 0.0, never NaN (variance clamp)") {
    // all values equal at a scale where ss/n - (s/n)^2 rounds negative in
    // the decimal(28,6) sufficient statistics — unclamped this was NaN,
    // which poisons downstream NaN-ordering comparisons
    val t = Table(Seq.fill(5)(0.0005).toDF("v"), "x")
    val r = t.describe(Seq("v")).collect().head
    assert(r.getDouble(4) == 0.0, s"constant column std must be 0.0, got ${r.getDouble(4)}")
  }

  test("whole-table delete unregisters the temp view (base.py:942 analog)") {
    val t = Table(Seq((1L, "a")).toDF("id", "v"), "del_me")
    assert(t.query(spark, "SELECT count(*) AS n FROM del_me")
      .collect().head.getLong(0) == 1L)
    t.delete(spark)
    assert(!spark.catalog.tableExists("del_me"),
      "deleted table must vanish from the catalog")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM del_me").collect()
    }
  }
}
