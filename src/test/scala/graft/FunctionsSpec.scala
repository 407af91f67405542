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
