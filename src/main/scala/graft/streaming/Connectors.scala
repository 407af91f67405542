package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** External stream connector wiring (SURVEY §2.B Kafka/Kinesis/SQS rows;
  * reference flock/src/datasource/{kafka,kinesis,sqs}.rs). This offline
  * environment ships no connector jars and has zero egress, so these
  * builders configure the reader without calling `.load()` — deploying
  * clusters add `spark-sql-kafka-0-10` (or the Kinesis connector) to the
  * classpath and call `.load()` on the returned reader.
  */
object Connectors {
  /** Kafka bid-event source (reference kafka.rs:1-165): JSON payloads on a
    * topic → the NEXMark `bid` schema via from_json.
    */
  def kafkaReader(spark: SparkSession, bootstrapServers: String,
      topic: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")

  val bidJsonSchema: StructType = StructType(Seq(
    StructField("auction", IntegerType),
    StructField("bidder", IntegerType),
    StructField("price", IntegerType),
    StructField("b_date_time", TimestampType)))

  /** Decode a Kafka `value` column (JSON bytes) into bid rows — the same
    * transform chain whatever the transport.
    */
  def decodeBidJson(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast(StringType), bidJsonSchema).as("b"))
      .select(col("b.auction"), col("b.bidder"), col("b.price"),
        col("b.b_date_time"))
}
