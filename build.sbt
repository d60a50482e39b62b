ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seaserpentspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // shuffle files are only deleted when the driver GC collects their
  // references; with a large heap a long single-JVM suite can spill
  // 40+ GB of dead shuffle data before the default 30-min periodic GC
  // fires — on the 1000x decade runs that fills the disk. 2 min keeps
  // disk bounded and costs one minor GC pause per interval.
  "-Dspark.cleaner.periodicGC.interval=2min",
  // spill/shuffle codec: zstd halves on-disk shuffle bytes vs the lz4
  // default — the decade benches on this box are DISK-bound (63 GB free
  // vs 60+ GB lz4 spill for the heaviest single queries), and a real
  // cluster would configure exactly this knob
  s"-Dspark.io.compression.codec=${sys.env.getOrElse("SPARK_IO_CODEC", "lz4")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
