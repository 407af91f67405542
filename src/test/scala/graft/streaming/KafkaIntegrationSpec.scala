package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Kafka END-TO-END integration — the one SURVEY §2.B row this offline
  * image cannot execute (no connector jar exists in any offline cache;
  * Connectors.scala documents the three-round verification of that
  * blocker). This spec makes enablement a CHECKBOX for a connected CI:
  *
  *   docker compose -f tools/kafka/docker-compose.yml up -d
  *   sbt -Dgraft.kafka.bootstrap=localhost:9092 \
  *       "testOnly graft.streaming.KafkaIntegrationSpec"
  *
  * with `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2` on
  * the classpath (Connectors.scala ENABLEMENT notes, verbatim). Without
  * the system property every test cancels (scalatest `assume`) — the spec
  * compiles and runs cleanly offline because it has ZERO compile-time
  * kafka dependencies: production goes through Spark's own kafka BATCH
  * SINK (format strings resolve at runtime), consumption through the
  * exact `Connectors.kafkaReader(...).load()` + [[Connectors.decodeBidJson]]
  * chain a deployment uses.
  */
class KafkaIntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val bootstrap = sys.props.get("graft.kafka.bootstrap")

  test("kafka round trip: bids through the sink, back via kafkaReader + decodeBidJson") {
    assume(bootstrap.isDefined,
      "kafka e2e needs -Dgraft.kafka.bootstrap=host:9092 + the " +
        "spark-sql-kafka-0-10 connector on the classpath " +
        "(tools/kafka/docker-compose.yml)")
    val bs = bootstrap.get
    val topic = s"graft_bids_${System.nanoTime()}"
    val bids = Nexmark.bids(spark, 2000L).cache()

    // Produce: JSON-encode each bid onto the topic via the kafka sink.
    bids
      .select(to_json(struct($"auction", $"bidder", $"price",
        $"b_date_time")).cast("binary").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()

    // Consume: the documented reader + decode chain, from the beginning,
    // one bounded run.
    val q = Connectors.decodeBidJson(
        Connectors.kafkaReader(spark, bs, topic)
          .option("startingOffsets", "earliest").load())
      .writeStream.format("memory").queryName("kafka_e2e_bids")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "kafka read did not finish in 120s")

    // Exact multiset equality on the value columns; the timestamp is
    // compared in epoch-µs so the JSON round trip cannot hide a unit or
    // timezone slip.
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"auction", $"bidder", $"price",
        unix_micros($"b_date_time").as("ts_us"))
    val got = key(spark.table("kafka_e2e_bids"))
    val expect = key(bids.toDF())
    assert(got.count() == expect.count(),
      s"kafka returned ${got.count()} of ${expect.count()} bids")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "kafka round trip changed bid values")
    bids.unpersist()
  }

  test("kafka exactly-once restart: second run from the same checkpoint adds nothing") {
    assume(bootstrap.isDefined,
      "kafka e2e needs -Dgraft.kafka.bootstrap=host:9092 (see above)")
    val bs = bootstrap.get
    val topic = s"graft_bids_ck_${System.nanoTime()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("kafka_e2e_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("kafka_e2e_out").toString
    val bids = Nexmark.bids(spark, 500L)
    bids.select(to_json(struct($"auction", $"bidder", $"price",
        $"b_date_time")).cast("binary").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs).option("topic", topic).save()
    def runOnce(): Unit = {
      val q = Connectors.decodeBidJson(
          Connectors.kafkaReader(spark, bs, topic)
            .option("startingOffsets", "earliest").load())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "kafka read did not finish in 120s")
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    runOnce() // same checkpoint, no new data: must be a no-op
    val n2 = spark.read.parquet(out).count()
    assert(n1 == 500L && n2 == n1,
      s"restart replayed kafka offsets: $n1 then $n2")
  }
}
