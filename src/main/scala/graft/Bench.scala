package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * sys.env("SPARK_GRAFT_SF_DIR") and prints ONE JSON line with per-query
  * wall-clock seconds. Materialization via the noop sink — full compute,
  * no collect, no count-only shortcuts (count() would let Catalyst skip
  * column decode on scan-only queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once on the smallest sf so the measured pass
    // reflects steady-state execution, not first-query classloading.
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save())

    // Optional args restrict the run to named queries (dev loop); the
    // driver always calls with no args.
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
