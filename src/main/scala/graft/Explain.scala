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
      // AQE off HERE only: under AdaptiveSparkPlan the printed plan is the
      // pre-execution skeleton — codegen collapse happens per-stage at
      // runtime, so WholeStageCodegen spans (and final join picks) are
      // invisible. The audit wants the static plan; Bench runs AQE on.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = sys.env.get("GRAFT_EXPLAIN_FULL").contains("1")
    for (n <- names; q <- Catalog.byName.get(n)) {
      val df = q.run(spark, sfDir)
      val executed = df.queryExecution.executedPlan
      val plan = executed.toString()
      def count(p: String) = plan.sliding(p.length).count(_ == p)
      // The tree STRING renders WholeStageCodegenExec as a bare `*(n)`
      // operator prefix, so codegen spans must be counted on the plan tree.
      val wscg = executed.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.size
      val summary = Seq(
        "scans" -> count("FileScan"),
        "pushedFilters" -> count("PushedFilters: ["),
        "bcastJoins" -> count("BroadcastHashJoin"),
        "smJoins" -> count("SortMergeJoin"),
        "exchanges" -> count("Exchange"),
        "bcastExchanges" -> count("BroadcastExchange"),
        "wscg" -> wscg,
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
