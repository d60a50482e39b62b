package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ColumnTypesSpec extends SparkSpec {
  import spark.implicits._
  import ColumnTypes._

  private val metas = Seq(
    ColumnMeta("done", "checkbox"),
    ColumnMeta("qty", "number"),                                 // precision 0 → Long
    ColumnMeta("price", "number", precision = Some(2)),          // → Double
    ColumnMeta("stars", "rate"),                                 // UInt8 → Short
    ColumnMeta("seq", "autonumber", format = Some("0000")),      // int format → Long
    ColumnMeta("tag_id", "autonumber", format = Some("ID-{num}")), // → String
    ColumnMeta("created", "ctime"),
    ColumnMeta("modified", "mtime"),
    ColumnMeta("took", "duration"),                              // seconds → interval
    ColumnMeta("labels", "multiple-select"),
    ColumnMeta("note", "text"))

  private def rawExport = Seq(
    ("true", "7", "3.50", "5", "0041", "ID-41", "2024-01-02 03:04:05",
      "2024-02-03 04:05:06", "3661", "red, green", "hello"),
    ("false", "", "", "0", "0042", "ID-42", "", "",
      "59", "blue", ""),
    (null, null, null, null, null, null, null, null, null, null, null))
    .toDF("done", "qty", "price", "stars", "seq", "tag_id", "created",
      "modified", "took", "labels", "note")

  test("map_columntype_inv long tail: schema mapping incl. rate/duration/" +
       "autonumber/mtime-ctime") {
    assert(sparkType(ColumnMeta("x", "rate")) == ShortType)
    assert(sparkType(ColumnMeta("x", "duration")) ==
      DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND))
    assert(sparkType(ColumnMeta("x", "autonumber", format = Some("0000"))) == LongType)
    assert(sparkType(ColumnMeta("x", "autonumber", format = Some("ID-{num}"))) == StringType)
    assert(sparkType(ColumnMeta("x", "auto-number", format = Some("20231001"))) == LongType)
    assert(sparkType(ColumnMeta("x", "mtime")) == TimestampType)
    assert(sparkType(ColumnMeta("x", "ctime")) == TimestampType)
    assert(sparkType(ColumnMeta("x", "number")) == LongType)
    assert(sparkType(ColumnMeta("x", "number", precision = Some(2))) == DoubleType)
    assert(sparkType(ColumnMeta("x", "checkbox")) == BooleanType)
    assert(sparkType(ColumnMeta("x", "multiple-select")) == ArrayType(StringType))
    assert(sparkType(ColumnMeta("x", "link")) == ArrayType(LongType))
    assert(sparkType(ColumnMeta("x", "collaborator")) == StringType)
  }

  test("applySchema converts a raw string export and round-trips parquet") {
    val typed = applySchema(rawExport, metas)
    // declared mapping == materialized schema, column by column
    metas.foreach { m =>
      assert(typed.schema(m.name).dataType == sparkType(m),
        s"column ${m.name} (${m.seaType})")
    }
    val r0 = typed.orderBy(desc("done")).collect()(0) // the 'true' row
    assert(r0.getAs[Boolean]("done"))
    assert(r0.getAs[Long]("qty") == 7L)
    assert(r0.getAs[Double]("price") == 3.5)
    assert(r0.getAs[Short]("stars") == 5.toShort)
    assert(r0.getAs[Long]("seq") == 41L)
    assert(r0.getAs[String]("tag_id") == "ID-41")
    assert(r0.getAs[java.sql.Timestamp]("created").toString
      .startsWith("2024-01-02 03:04:05"))
    assert(r0.getAs[java.time.Duration]("took") ==
      java.time.Duration.ofSeconds(3661L))
    assert(r0.getSeq[String](r0.fieldIndex("labels")) == Seq("red", "green"))
    // '' ≡ NULL on every non-text column (reference note #5); text keeps ''
    val r1 = typed.filter(col("seq") === 42L).collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("qty")) && r1.isNullAt(r1.fieldIndex("price")))
    assert(r1.isNullAt(r1.fieldIndex("created")) && r1.isNullAt(r1.fieldIndex("modified")))
    assert(r1.getAs[String]("note") == "")
    // parquet round-trip preserves the whole mapped schema (incl. the
    // ANSI interval for duration) and the values
    val dir = java.nio.file.Files.createTempDirectory("graft_ct").toString
    typed.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val back = spark.read.parquet(s"$dir/t.parquet")
    assert(back.schema == typed.schema)
    assert(back.count() == 3L)
    val b0 = back.orderBy(desc("done")).collect()(0)
    assert(b0.getAs[java.time.Duration]("took") ==
      java.time.Duration.ofSeconds(3661L))
  }
}
