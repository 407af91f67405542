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
    // Global-sort placement probe (guide §2.4): for scan→project→orderBy
    // entries the range exchange's sampling pass re-executes the child,
    // so an expensive projection pays twice; sorting the narrow input
    // first and projecting after the sort computes it once.
    // p23 top-token expression probe: O(distinct × n) transform/filter
    // count vs O(n log n) sort + max-run-length fold; prints timings and
    // a mismatch count (must be 0 — same max frequency by definition).
    if (which == "p23shape") {
      import org.apache.spark.sql.functions._
      val quad = expr(
        """array_max(transform(array_distinct(split(text, ' ')),
             d -> size(filter(split(text, ' '), t -> t = d))))""")
      val runlen = expr(
        """aggregate(array_sort(split(text, ' ')),
             named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
             (a, t) -> named_struct(
               'prev', t,
               'run', IF(t <=> a.prev, a.run + 1, 1),
               'best', greatest(a.best, IF(t <=> a.prev, a.run + 1, 1))),
             a -> a.best)""")
      def t2(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          System.err.println(
            f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      t2("p23_quad")(docs.select(col("doc_id"), quad.as("c")))
      t2("p23_runlen")(docs.select(col("doc_id"), runlen.as("c")))
      val mism = docs.select(quad.as("a"), runlen.as("b"))
        .filter(col("a") =!= col("b")).count()
      System.err.println(s"[probe] p23 mismatches: $mism")
    }
    if (which == "sortshape") {
      import org.apache.spark.sql.functions._
      def noop(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      val proj = Seq(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
        sha2(col("text"), 256).as("sha"))
      for (i <- 1 to 3) {
        time(s"proj_then_orderBy_$i")(noop(
          docs.select(proj: _*).orderBy(col("doc_id"))))
        time(s"orderBy_then_proj_$i")(noop(
          docs.select(col("doc_id"), col("text"))
            .orderBy(col("doc_id")).select(proj: _*)))
        time(s"no_orderBy_$i")(noop(docs.select(proj: _*)))
      }
    }
    spark.stop()
  }
}
