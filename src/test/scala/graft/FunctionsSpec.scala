package graft

import graft.functions.{GraftExtensions, MinHashShingleSig, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions: value parity against the HOF/SQL formulations they
  * replace, plus SQL registration.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("cosine_similarity matches the sequential-fold HOF formulation") {
    val emb = Tables.load(spark, sf, "embeddings")
    val qv = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val both = emb.crossJoin(broadcast(qv))
      .select($"vec_id",
        VectorFunctions.cosine_similarity($"embedding", $"qvec").as("fast"),
        (expr("""aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
            (acc, i) -> acc + CAST(element_at(embedding, i) AS DOUBLE) * CAST(element_at(qvec, i) AS DOUBLE))""") /
          (sqrt(expr("""aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
            (acc, i) -> acc + CAST(element_at(embedding, i) AS DOUBLE) * CAST(element_at(embedding, i) AS DOUBLE))""")) *
           sqrt(expr("""aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
            (acc, i) -> acc + CAST(element_at(qvec, i) AS DOUBLE) * CAST(element_at(qvec, i) AS DOUBLE))"""))))
          .as("slow"))
    // Bit-identical, not approximately equal: same fold order in double.
    assert(both.filter($"fast" =!= $"slow").isEmpty)
  }

  test("minhash_sig matches the HOF md5/xor formulation bit for bit") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("sh", expr(
        """CASE WHEN size(split(text, ' ')) >= 3
             THEN transform(sequence(1, size(split(text, ' ')) - 2),
                            i -> concat_ws(' ', slice(split(text, ' '), i, 3)))
             ELSE array() END"""))
      .withColumn("mh", expr("transform(sh, sg -> md5(sg))"))
      .withColumn("h1", expr(
        "transform(mh, m -> CAST(conv(substr(m, 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("h2", expr(
        "transform(mh, m -> CAST(conv(substr(m, 17, 15), 16, 10) AS BIGINT))"))
      .withColumn("sig", MinHashShingleSig.minhash_sig($"text"))
    val bad = (0 until 4).map { i =>
      docs.filter(element_at($"sig", i + 1) =!=
        expr(s"array_min(zip_with(h1, h2, (a, b) -> a ^ (CAST($i AS BIGINT) * b)))"))
        .count()
    }
    assert(bad.forall(_ == 0), s"minhash mismatch counts: $bad")
  }

  test("minhash LSH banding is parameterizable; multi-row bands are stricter") {
    // 2 bands × 2 rows: a pair is a candidate only when a FULL band (two
    // consecutive minhashes) matches — a subset of the 4×1 candidates,
    // which match on any single value. Exercises the array band-key path.
    val p41 = graft.operators.Pipeline.minhashLshPairs(spark, sf, 4, 1)
      .select($"id_a".cast("long"), $"id_b".cast("long")).as[(Long, Long)].collect().toSet
    val p22 = graft.operators.Pipeline.minhashLshPairs(spark, sf, 2, 2)
      .select($"id_a".cast("long"), $"id_b".cast("long")).as[(Long, Long)].collect().toSet
    assert(p22.subsetOf(p41), s"2x2 pairs not a subset of 4x1: ${p22 -- p41}")
    assert(p41.nonEmpty)
  }

  test("shingles / minhash / lsh_bucket stay inside whole-stage codegen") {
    // Round-1 finding: CodegenFallback forced interpreted per-row calls.
    // The static-helper codegen must keep the projection in a single
    // WholeStageCodegen stage with no fallback marker.
    val docs = Tables.load(spark, sf, "documents")
      .select(graft.functions.ShingleArray.shingles($"text").as("sh"),
        MinHashShingleSig.minhash_sig($"text").as("sig"))
    val emb = Tables.load(spark, sf, "embeddings")
      .select(VectorFunctions.lsh_bucket($"embedding").as("b"))
    for (df <- Seq(docs, emb)) {
      val codegenProjects = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
            if w.collectLeaves().nonEmpty => w
      }
      assert(codegenProjects.nonEmpty,
        s"no WholeStageCodegen stage:\n${df.queryExecution.executedPlan}")
      // The custom expressions must sit INSIDE the codegen stage (rendered
      // with the *(n) fused prefix), not in a fallback Project outside it.
      val s = df.queryExecution.executedPlan.toString()
      assert(s.contains("*(1) Project"), s"projection not fused:\n$s")
      assert(df.count() > 0)
    }
  }

  test("functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, sf)
    val r1 = spark.sql(
      """SELECT cosine_similarity(embedding, embedding) AS c
         FROM embeddings LIMIT 5""").as[Double].collect()
    assert(r1.forall(c => math.abs(c - 1.0) < 1e-9))
    val r2 = spark.sql(
      "SELECT minhash_sig(text) AS s FROM documents LIMIT 3").collect()
    assert(r2.forall(_.getSeq[Long](0).length == 4))
    val r3 = spark.sql(
      """SELECT simhash60(transform(split(text, ' '),
           t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))) AS h
         FROM documents LIMIT 3""").as[Long].collect()
    assert(r3.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("extensions class applies cleanly to a SparkSessionExtensions") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // must not throw
  }
}
