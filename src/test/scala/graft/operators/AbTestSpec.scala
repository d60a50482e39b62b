package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  test("welch t on a hand-computed fixture") {
    // A = [1,2,3,4], B = [2,4,6,8,10]:
    // mean_a 2.5, mean_b 6, va 5/3, vb 10, se2 = va/4 + vb/5 = 2.41667,
    // t = -3.5/sqrt(se2) = -2.251436, df (Satterthwaite) = 5.5208
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(v => ("m", v, "A")) ++
      Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(v => ("m", v, "B"))
    val df = rows.toDF("metric", "value", "arm")
    val r = Events.abtestWithArms(df, "metric", "value", "arm").collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("mean_a") == 2.5 && r.getAs[Double]("mean_b") == 6.0)
    assert(r.getAs[Double]("t_stat") == -2.251436)
    assert(r.getAs[Double]("df") == 5.5208)
    assert(r.getAs[Boolean]("significant"))
  }

  test("degenerate guards: constant arms and singleton arms") {
    // both arms constant & equal → se2 = 0 → null t, not significant
    val const = (Seq.fill(3)(("m", 5.0, "A")) ++ Seq.fill(3)(("m", 5.0, "B")))
      .toDF("metric", "value", "arm")
    val rc = Events.abtestWithArms(const, "metric", "value", "arm").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("t_stat")))
    assert(!rc.getAs[Boolean]("significant"))
    // an arm with n < 2 has no sample variance → null t/df
    val single = Seq(("m", 1.0, "A"), ("m", 2.0, "B"), ("m", 3.0, "B"))
      .toDF("metric", "value", "arm")
    val rs = Events.abtestWithArms(single, "metric", "value", "arm").collect()(0)
    assert(rs.isNullAt(rs.fieldIndex("t_stat")))
    assert(rs.isNullAt(rs.fieldIndex("df")))
    assert(!rs.getAs[Boolean]("significant"))
  }

  test("linreg recovers a planted line and guards degenerate groups") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // y = 2x + 5 exactly; x = 0..9 seconds from the corpus min
    val lineRows = (0L to 9L).map(i => ("line", at(i), 2.0 * i + 5.0))
    // constant y -> dy = 0 -> r2 null but slope 0; constant x -> all null
    val flatRows = (0L to 9L).map(i => ("flat", at(i), 7.0))
    val constX = Seq.fill(5)(("constx", at(3L), 1.0)) :+
      (("constx", at(3L), 9.0))
    val df = (lineRows ++ flatRows ++ constX).toDF("event_type", "ts", "value")
    val out = Events.linregByGroup(df, "event_type", "ts", "value")
      .orderBy("event_type").collect()
    val m = out.map(r => r.getString(0) -> r).toMap
    assert(m("constx").isNullAt(2) && m("constx").isNullAt(3) &&
      m("constx").isNullAt(4))
    assert(m("flat").getDouble(2) == 0.0 && m("flat").getDouble(3) == 7.0 &&
      m("flat").isNullAt(4))
    assert(m("line").getDouble(2) == 2.0 && m("line").getDouble(3) == 5.0 &&
      m("line").getDouble(4) == 1.0)
  }

  test("dailyEwma reproduces the pandas adjust=False recursion") {
    val rows = Seq(
      ("m", "2024-01-01 10:00:00", 4.0),
      ("m", "2024-01-01 11:00:00", 4.0), // day 1: y = 8
      ("m", "2024-01-02 10:00:00", 2.0), // day 2: y = 2
      ("m", "2024-01-04 10:00:00", 10.0)) // day 3 (gap day skipped): y = 10
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Events.dailyEwma(rows, "event_type", "ts", "value")
      .orderBy("day_s")
      .select("day_s", "n", "ewma")
      .as[(String, Long, Double)].collect().toSeq
    // s1 = 8; s2 = 2/2 + 8/2 = 5; s3 = 10/2 + 5/2 = 7.5
    assert(out == Seq(("2024-01-01", 2L, 8.0), ("2024-01-02", 1L, 5.0),
      ("2024-01-04", 1L, 7.5)))
  }

  test("dailyEwma survives histories spanning more than 64 active days") {
    // 70 consecutive days of the constant 8.0: pandas ewm(adjust=False)
    // gives s_d = 8 for every d. Without the k <= 62 clamp, Spark's
    // shiftleft wraps at day 65 (1L << 64 == 1), so the day-1 seed term
    // would re-enter at ~full weight and the line would jump to ~16.
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val rows = (0 until 70).map { d =>
      ("m", new java.sql.Timestamp(base.getTime + d * 86400000L), 8.0)
    }.toDF("event_type", "ts", "value")
    val out = Events.dailyEwma(rows, "event_type", "ts", "value")
      .orderBy("day_s").select("ewma").as[Double].collect()
    assert(out.length == 70)
    // s_d = 8 exactly for d <= 63; beyond the clamp the dropped tail
    // weighs <= 2^-62, far below the round-6 output quantum
    assert(out.forall(_ == 8.0), s"unexpected ewma values: ${out.toSeq}")
  }

  test("hash arms are unit-consistent and both populated") {
    val ev = graft.tables.Tables.events(spark, sf("sf0.001"))
    val armed = ev.withColumn("arm",
      when(Sampling.hashKey("ab42", col("user_id")) < lit("8000"),
        lit("A")).otherwise(lit("B")))
    // every user maps to exactly one arm
    val multi = armed.groupBy("user_id")
      .agg(countDistinct("arm").as("n")).filter(col("n") > 1).count()
    assert(multi == 0L)
    // a 50/50 md5 split leaves neither arm empty at 600 users
    val arms = armed.select("arm").distinct().as[String].collect().toSet
    assert(arms == Set("A", "B"))
  }
}
