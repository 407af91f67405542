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
      .master(s"local[${sys.env.getOrElse("GRAFT_PROBE_CPUS", "32")}]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PROBE_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Shuffle/IO codec A/B for the production-conf evidence table
      // (guide §2.3/§9): lz4 default vs GRAFT_IO_CODEC=zstd.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "lz4"))
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
    // p104 covariance-cell topology probe (r15): the double-posexplode
    // carries the full e3 array through the first explode (64 copies of a
    // 64-long array per embedding) vs a single explode over an in-row
    // flattened (i, j, xi*xj) struct array. Prints timings + a cell-level
    // mismatch count (must be 0 — same products by definition).
    if (which == "p104shape") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val e = Tables.load(spark, dir, "embeddings")
        .filter(size(col("embedding")) === 64)
        .select(expr(
          """transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 1000.0D + 0.5D) AS BIGINT))""")
          .as("e3"))
      def sijOld = e
        .select(col("e3"), posexplode(col("e3")).as(Seq("i", "xi")))
        .select(col("i"), col("xi"),
          posexplode(expr("slice(e3, i + 1, 64)")).as(Seq("dj", "xj")))
        .groupBy(col("i"), (col("i") + col("dj")).cast(IntegerType).as("j"))
        .agg(sum((col("xi") * col("xj")).cast(DecimalType(38, 0))).as("s_ij"))
      def sijNew = e
        .select(explode(expr(
          """flatten(transform(sequence(0, 63), i ->
               transform(sequence(i, 63), j ->
                 named_struct('i', i, 'j', j,
                   'p', element_at(e3, i + 1) * element_at(e3, j + 1)))))"""))
          .as("c"))
        .groupBy(col("c.i").as("i"), col("c.j").as("j"))
        .agg(sum(col("c.p").cast(DecimalType(38, 0))).as("s_ij"))
      def t3(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          System.err.println(
            f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      t3("p104_sij_double_posexplode")(sijOld)
      t3("p104_sij_inrow_pairs")(sijNew)
      val mism = sijOld.as("a").join(sijNew.as("b"),
          col("a.i") === col("b.i") && col("a.j") === col("b.j"),
          "full_outer")
        .filter(not(col("a.s_ij") <=> col("b.s_ij"))).count()
      System.err.println(s"[probe] p104 cell mismatches: $mism")
    }
    // p42 graph-build probe (r15): the edges pin currently materializes
    // pairs to a DISK_ONLY localCheckpoint first (two serial
    // materializations). If ReuseExchange dedupes the distinct's exchange
    // across the forward/reversed union branches, the intermediate pin is
    // a pure cost — same rows, one pass, no extra disk write.
    if (which == "p42shape") {
      import org.apache.spark.sql.functions._
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val or = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      def pairs = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
      for (i <- 1 to 2) {
        time(s"p42_edges_via_cp_pin_$i") {
          val cp = pairs.localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.DISK_ONLY)
          val pp = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
          val e = pp.select(col("cnode").as("src"), col("snode").as("dst"))
            .unionAll(pp.select(col("snode").as("src"), col("cnode").as("dst")))
            .repartition(col("dst"))
          e.write.format("noop").mode("overwrite").save()
          cp.rdd.unpersist(blocking = false); 0L
        }
        time(s"p42_edges_direct_union_$i") {
          val p = pairs
          val e = p.select(col("cnode").as("src"), col("snode").as("dst"))
            .unionAll(p.select(col("snode").as("src"), col("cnode").as("dst")))
            .repartition(col("dst"))
          e.write.format("noop").mode("overwrite").save(); 0L
        }
        // Both directions minted in-row by a generator: pairs is consumed
        // exactly ONCE (no pin, no second derivation) at any scale.
        time(s"p42_edges_inrow_explode_$i") {
          val e = pairs
            .select(explode(array(
              struct(col("cnode").as("src"), col("snode").as("dst")),
              struct(col("snode").as("src"), col("cnode").as("dst"))))
              .as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
            .repartition(col("dst"))
          e.write.format("noop").mode("overwrite").save(); 0L
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      val p = pairs
      val e = p.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(p.select(col("snode").as("src"), col("cnode").as("dst")))
        .repartition(col("dst"))
      e.write.format("noop").mode("overwrite").save()
      val plan = e.queryExecution.executedPlan.toString()
      System.err.println(s"[probe] p42 direct-union ReusedExchange nodes: " +
        s"${plan.sliding("ReusedExchange".length).count(_ == "ReusedExchange")}")
      // The p42 entry pins edges eagerly, so the graph-BUILD phase never
      // appears in the entry's final plan; dump the edge-build plans of
      // the r14 (pin + two reads) and r15 (in-row explode) variants here
      // as the committed evidence for the Change-3 plan claim.
      def dumpPlan(path: String, df: org.apache.spark.sql.DataFrame): Unit =
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            .getBytes("UTF-8")): Unit
      dumpPlan("/root/repo/plans/r15/p42_edges_build_before.txt", {
        val cp = pairs.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val pp = cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
        pp.select(col("cnode").as("src"), col("snode").as("dst"))
          .unionAll(pp.select(col("snode").as("src"), col("cnode").as("dst")))
          .repartition(col("dst"))
      })
      dumpPlan("/root/repo/plans/r15/p42_edges_build_after.txt",
        pairs.select(explode(array(
            struct(col("cnode").as("src"), col("snode").as("dst")),
            struct(col("snode").as("src"), col("cnode").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .repartition(col("dst")))
    }
    // p84 window-count skew probe (r15, VERDICT item 5): the r14 rewrite
    // counts gram occurrences with count() OVER (PARTITION BY g), which
    // buffers a corpus-hot boilerplate gram's every occurrence in ONE
    // window partition (AQE skew handling covers joins, not windows).
    // Adversarial corpus: append the same 8-token block REP times to half
    // the docs -> 8 mega-hot grams. Compares the committed window
    // topology against a salted two-phase variant on the same rows.
    if (which == "p84skew") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rep = sys.env.get("GRAFT_P84_REP").map(_.toInt).getOrElse(50)
      val boiler = (1 to rep).flatMap(_ => (1 to 8).map(i => s"b$i")).mkString(" ")
      val skewed = docs
        .withColumn("text",
          when(col("doc_id") % 2 === 0, concat(col("text"), lit(" " + boiler)))
            .otherwise(col("text")))
        .select(col("doc_id"), col("source"), col("text"))
      def grams(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ts"))
        .withColumn("n_tok", size(col("ts")).cast("long"))
        .filter(col("n_tok") >= 8)
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(1, CAST(n_tok AS INT) - 7),
                       i -> md5(array_join(slice(ts, i, 8), ' ')))"""))
          .as(Seq("off", "g")))
        .select(col("doc_id"), (col("off") + 1).as("pos"), col("g"))
      def covered(cnt: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
        cnt(grams(skewed))
          .filter(col("n_occ") >= 2)
          .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 7)).as("p"))
          .distinct()
          .groupBy(col("doc_id")).agg(count(lit(1)).as("cov"))
      val windowCnt = (g: org.apache.spark.sql.DataFrame) =>
        g.withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("g"))))
      // Salted two-phase: partial count per (g, salt) via one skew-free
      // window, then per-g totals (<= 64 rows per gram) summed and
      // broadcast-joined back to the rows already exchanged by (g, salt).
      val saltedCnt = (g: org.apache.spark.sql.DataFrame) => {
        val salted = g.withColumn("_salt",
          pmod(xxhash64(col("doc_id"), col("pos")), lit(64L)))
        val part = salted.withColumn("c_part",
          count(lit(1)).over(Window.partitionBy(col("g"), col("_salt"))))
        val totals = part
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("g"), col("_salt")).orderBy(col("doc_id"), col("pos"))))
          .filter(col("rn") === 1)
          .groupBy(col("g")).agg(sum(col("c_part")).as("n_occ"))
        part.drop("c_part", "_salt").join(broadcast(totals), "g")
      }
      def t2(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          System.err.println(
            f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      val hot = grams(skewed).groupBy(col("g")).count()
        .orderBy(col("count").desc).limit(3).collect()
      System.err.println(s"[probe] p84skew rep=$rep hottest grams: " +
        hot.map(r => r.getLong(1)).mkString(", "))
      t2("p84skew_window_cnt_only")(windowCnt(grams(skewed)))
      // GRAFT_P84_ONLY=cnt: just the count-stage arm (doubles as the
      // shuffle-codec probe body — ~10M 48-byte rows through one
      // g-keyed exchange + window).
      if (!sys.env.get("GRAFT_P84_ONLY").contains("cnt")) {
        t2("p84skew_salted_cnt_only")(saltedCnt(grams(skewed)))
        t2("p84skew_window")(covered(windowCnt))
        t2("p84skew_salted")(covered(saltedCnt))
        val mism = covered(windowCnt).as("a").join(covered(saltedCnt).as("b"),
            col("a.doc_id") === col("b.doc_id"), "full_outer")
          .filter(not(col("a.cov") <=> col("b.cov"))).count()
        System.err.println(s"[probe] p84skew coverage mismatches: $mism")
      }
    }
    // p71 phase decomposition (r15): where do the seconds go — the
    // sigs scan (shingle+minhash expression), candidate generation, or
    // the verify join — and what does pinning sigs (compute the heavy
    // expression once instead of 3x) buy?
    if (which == "p71shape") {
      import org.apache.spark.sql.functions._
      def noopW(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      for (i <- 1 to 2) {
        time(s"p71_full_$i")(noopW(operators.Pipeline.p71Body(spark, dir, pinSigs = false)))
        time(s"p71_full_pinned_$i")(noopW(operators.Pipeline.p71Body(spark, dir, pinSigs = true)))
        time(s"p71_full_parquet_$i")(noopW(operators.Pipeline.p71Body(spark, dir,
          pinSigs = false, parquetPin = true)))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
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
