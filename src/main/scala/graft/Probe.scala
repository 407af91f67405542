package graft

import org.apache.spark.sql.SparkSession

/** Dev-tool main: time the capped blocked-dedup bodies at a given dir and
  * cap, isolating the block-cap trade (exact all-pairs under the cap vs
  * LSH star route above it) from the rest of the catalog.
  *
  * Usage: sbt "runMain graft.Probe <dir> <cap> [p15|p16|both]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val cap = args.lift(1).map(_.toInt).getOrElse(operators.Pipeline.DefaultBlockCap)
    val which = args.lift(2).getOrElse("both")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[probe] $name%-28s cap=$cap%-11d rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    if (which == "p15" || which == "both")
      time("p15_fuzzy_dedup")(operators.Pipeline.fuzzyDedupPairs(docs, cap).count())
    if (which == "p16" || which == "both")
      time("p16_ngram_jaccard")(operators.Pipeline.ngramJaccardPairs(docs, cap).count())
    // Stage decomposition of the PageRank entry: where do the seconds go
    // at a given sf — graph build (join+distinct), the two pins, or the
    // unrolled rounds?
    if (which == "p42")
      operators.Pipeline.graphAuthorityProbe(spark, dir, time)
    if (which == "p61")
      operators.Pipeline.labelPropProbe(spark, dir, time)
    spark.stop()
  }
}
