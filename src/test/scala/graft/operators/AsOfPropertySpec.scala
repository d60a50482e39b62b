package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force equivalence for the full merge_asof surface: random
  * timelines, every direction, with and without tolerance, plain and
  * sharded — the reference semantics computed per-row on the driver.
  * Deterministic seed so failures reproduce.
  */
case class AsOfL(k: Long, us: Long, lid: Long)
case class AsOfR(k: Long, us: Long, rv: String)

class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private type L = AsOfL
  private type R = AsOfR
  private val L = AsOfL
  private val R = AsOfR

  /** The pandas rule, computed naively: candidates by direction, closest
    * wins (nearest ties prefer backward), tolerance drops stale picks. */
  private def expected(left: Seq[L], right: Seq[R], direction: String,
                       tolUs: Option[Long]): Map[Long, Option[String]] =
    left.map { l =>
      val back = right.filter(r => r.k == l.k && r.us <= l.us)
        .sortBy(r => (r.us, r.rv)).lastOption
      val fwd = right.filter(r => r.k == l.k && r.us >= l.us)
        .sortBy(r => (r.us, r.rv)).headOption
      def gate(c: Option[R]): Option[R] =
        c.filter(r => tolUs.forall(t => math.abs(l.us - r.us) <= t))
      val pick = direction match {
        case "backward" => gate(back)
        case "forward"  => gate(fwd)
        case "nearest" => (gate(back), gate(fwd)) match {
          case (Some(b), Some(f)) =>
            if (f.us - l.us < l.us - b.us) Some(f) else Some(b)
          case (b, f) => b.orElse(f)
        }
      }
      l.lid -> pick.map(_.rv)
    }.toMap

  test("asOfJoin == brute force on random timelines: 3 directions x " +
       "2 tolerances, plain and sharded") {
    val rnd = new scala.util.Random(42)
    // ~25% duplicate instants across sides to exercise exact-ts matches;
    // right unique per (key, us) by construction (distinct draws + dedup)
    val instants = Vector.tabulate(40)(i => i * 7919L * 1000L)
    val left = (for (k <- 1L to 4L; i <- 1 to 30) yield
      L(k, instants(rnd.nextInt(instants.size)) + rnd.nextInt(3) * 500L,
        k * 1000 + i)).toSeq
    val right = (for (k <- 1L to 3L; i <- 1 to 15) yield
      R(k, instants(rnd.nextInt(instants.size)),
        s"r$k-$i")).groupBy(r => (r.k, r.us))
      .map(_._2.maxBy(_.rv)).toSeq
    val lDf = left.toDF("k", "us", "lid")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("lid"))
    val rDf = right.toDF("k", "us", "rv")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("rv"))
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(60L))) {
      val exp = expected(left, right, dir, tol.map(_ * 1000000L))
      val got = TemporalJoins.asOfJoin(lDf, rDf, "k", "ts", Seq("rv"),
          direction = dir, toleranceSec = tol)
        .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
      assert(got == exp, s"direction=$dir tolerance=$tol diverged: " +
        (got.toSet -- exp.toSet).take(5) + " vs " + (exp.toSet -- got.toSet).take(5))
      if (dir == "backward") {
        val sharded = TemporalJoins.asOfJoinSharded(lDf, rDf, "k", "ts",
            Seq("rv"), shards = 8, toleranceSec = tol)
          .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
        assert(sharded == exp, s"sharded tolerance=$tol diverged")
      }
    }
  }
}
