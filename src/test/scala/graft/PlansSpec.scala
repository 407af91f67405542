package graft

import graft.plans.{TopK, TopKPerKeyExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Custom physical operator (TopKPerKey): semantics equal the rank-filter
  * formulation; plan shape shows the custom exec and a single exchange.
  */
class PlansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def base = Tables.load(spark, sf, "orders")
    .select($"o_custkey", $"o_orderkey", $"o_totalprice")

  test("TopKPerKey equals the window-rank formulation") {
    val fast = TopK.perKey(base, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val expected = base.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
    assert(fast.exceptAll(expected).isEmpty && expected.exceptAll(fast).isEmpty)
  }

  test("TopKPerKey plans the custom exec with one exchange and no sort") {
    val df = TopK.perKey(base, Seq($"o_custkey"), Seq($"o_totalprice".desc), 2)
    val plan = df.queryExecution.executedPlan
    val s = plan.toString()
    assert(s.contains("TopKPerKey"), s"custom exec missing:\n$s")
    assert(!s.contains("Sort "), s"unexpected sort in plan:\n$s")
    assert(s.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly one exchange:\n$s")
  }

  test("TopKPerKey guards per-partition key cardinality instead of OOMing") {
    // 1500 distinct keys in one partition vs a 1000-key guard: the task
    // must fail fast with the actionable message, not degrade silently.
    val wide = spark.range(0, 1500).select(
      $"id".as("o_custkey"), $"id".as("o_orderkey"),
      ($"id" % 7).cast("double").as("o_totalprice")).coalesce(1)
    val guarded = TopK.perKey(wide, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 2,
      maxKeysPerPartition = 1000)
    val ex = intercept[Exception](guarded.count())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: messages(t.getCause)
    assert(messages(ex).exists(m => m != null && m.contains("maxKeysPerPartition")),
      s"guard message missing: ${ex.getMessage}")
    // Same data under the default guard: full result, no failure.
    val ok = TopK.perKey(wide, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 2)
    assert(ok.count() == 1500)
  }

  test("TopKPerKey handles k larger than group size and single groups") {
    val tiny = Seq((1, 10, 5.0), (1, 11, 7.0), (2, 20, 1.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val out = TopK.perKey(tiny, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 5)
    assert(out.count() == 3)
    val top1 = TopK.perKey(tiny, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 1)
      .orderBy($"o_custkey")
      .select($"o_orderkey").as[Int].collect().toSeq
    assert(top1 == Seq(11, 20))
  }

  test("TopKRewrite turns dropped-rank window filters into TopKPerKey") {
    TopK.installRewrite(spark)
    try {
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val idiom = base.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn")
      val s = idiom.queryExecution.executedPlan.toString()
      assert(s.contains("TopKPerKey"), s"rewrite did not fire:\n$s")
      assert(!s.contains("Window"), s"window survived the rewrite:\n$s")
      // Value equality against the un-rewritten formulation.
      val noRewrite = base.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
      assert(idiom.count() == noRewrite.count())
      assert(idiom.exceptAll(noRewrite.drop("rn")).isEmpty)

      // The rank column escaping the projection must VETO the rewrite...
      val kept = base.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      val sKept = kept.queryExecution.executedPlan.toString()
      assert(!sKept.contains("TopKPerKey"), s"rewrite misfired:\n$sKept")
      // ...as must rank() (ties overflow a k-heap) and a global window.
      val ranked = base.withColumn("rn", rank().over(w))
        .filter($"rn" <= 3).drop("rn")
      assert(!ranked.queryExecution.executedPlan.toString()
        .contains("TopKPerKey"), "rank() must not rewrite")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.TopKRewrite)
    }
  }

  test("TopKRewrite honors the kill switch, maxKeys conf, and commuted bounds") {
    TopK.installRewrite(spark)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    def idiom(cond: org.apache.spark.sql.Column) =
      base.withColumn("rn", row_number().over(w)).filter(cond).drop("rn")
    try {
      // Commuted filter forms some frontends normalize to: lit OP rank.
      for (cond <- Seq(lit(3) >= $"rn", lit(4) > $"rn", lit(1) === $"rn")) {
        val s = idiom(cond).queryExecution.executedPlan.toString()
        assert(s.contains("TopKPerKey"), s"commuted form did not rewrite:\n$s")
      }
      // Kill switch: a session that disables the rewrite keeps the
      // spill-capable window sort.
      spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "false")
      try assert(!idiom($"rn" <= 3).queryExecution.executedPlan.toString()
        .contains("TopKPerKey"), "kill switch ignored")
      finally spark.conf.unset(graft.plans.TopKRewrite.EnabledKey)
      // maxKeysPerPartition threads through the rule into the operator.
      spark.conf.set(graft.plans.TopKRewrite.MaxKeysKey, "1")
      try {
        val ex = intercept[Exception](idiom($"rn" <= 3).count())
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil else t.getMessage +: messages(t.getCause)
        assert(messages(ex).exists(m => m != null && m.contains("maxKeysPerPartition")),
          s"conf-threaded guard missing: ${ex.getMessage}")
      } finally spark.conf.unset(graft.plans.TopKRewrite.MaxKeysKey)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.TopKRewrite)
    }
  }

  test("no catalog plan contains a Python UDF or an unbroadcast cartesian") {
    // Institutionalizes the per-round plan audit (graft.Explain): every
    // entry must stay on the codegen path (no serialization boundary) and
    // every intentional cross join must be a broadcast singleton (a
    // CartesianProductExec would shuffle |left|x|right| at scale).
    for ((name, q) <- Catalog.byName.toSeq.sortBy(_._1)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString()
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ArrowEvalPython"),
        s"$name plans a Python UDF node")
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct (use broadcast for singleton sides)")
    }
  }
}
