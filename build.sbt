ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flockspark"
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
// Forward the terminal's stdin to the forked runMain JVM — required by
// the interactive graft.Fsql shell; a no-op for the batch mains
// (Verify/Bench never read stdin).
run / connectInput := true
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
// Heap: honor SPARK_DRIVER_MEM but clamp to 32g. Round-3 forensics: the
// driver ran the bench with a ~90g heap on a 128 GiB box and a handful of
// entries stalled for 100+ s (q01 106s, sql_tpch_q21 209s); the identical
// commit re-run at 8g finished the whole catalog in 119s with no entry
// over 9s. A heap sized near physical RAM leaves nothing for the OS page
// cache holding the parquet inputs, and direct-reclaim stalls show up as
// random multi-minute pauses. sf0.1 needs well under 8g; 32g is 4× proven
// headroom.
val driverMem: String = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  def num(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: NumberFormatException => None }
  val gigs =
    if (raw.endsWith("g")) num(raw.dropRight(1))
    else if (raw.endsWith("m")) num(raw.dropRight(1)).map(_ / 1024)
    else num(raw).map(_ / (1024.0 * 1024 * 1024))
  gigs match {
    case Some(g) if g > 32 => "32g"
    case Some(_) => raw
    case None => "8g"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
