package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene audit: prints the formatted physical plan for the named
  * catalog queries (all of them with no args) plus a one-line summary of
  * scan pushdown, broadcast vs shuffle joins, and exchange count — the
  * things that decide whether a plan survives a 100× scale-up.
  *
  * Run: sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Catalog.byName.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = sys.env.get("GRAFT_EXPLAIN_FULL").contains("1")
    for (n <- names; q <- Catalog.byName.get(n)) {
      val df = q.run(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString()
      def count(p: String) = plan.sliding(p.length).count(_ == p)
      val summary = Seq(
        "scans" -> count("FileScan"),
        "pushedFilters" -> count("PushedFilters: ["),
        "bcastJoins" -> count("BroadcastHashJoin"),
        "smJoins" -> count("SortMergeJoin"),
        "exchanges" -> count("Exchange"),
        "bcastExchanges" -> count("BroadcastExchange"),
        "wscg" -> count("WholeStageCodegen"),
        "udfs" -> count("BatchEvalPython"))
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
      println(s"== $n: $summary")
      if (verbose) {
        df.explain("formatted")
        println()
      }
    }
    spark.stop()
  }
}
