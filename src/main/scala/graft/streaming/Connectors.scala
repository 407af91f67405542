package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** External stream connector wiring (SURVEY §2.B Kafka/Kinesis/SQS rows;
  * reference flock/src/datasource/{kafka,kinesis,sqs}.rs). This offline
  * environment ships no connector jars and has zero egress, so these
  * builders configure the reader without calling `.load()` — deploying
  * clusters add `spark-sql-kafka-0-10` / `spark-streaming-sql-kinesis`
  * to the classpath and call `.load()` on the returned reader.
  *
  * ENVIRONMENT BLOCKER, verified rounds 5, 6 AND 7: no kafka/kinesis
  * connector artifact exists in `/opt/spark/jars` or the offline
  * coursier/ivy caches (re-checked r7 with a whole-filesystem `find`
  * for kafka jars/dirs: only unrelated Python SDK data — no ivy2, no
  * coursier cache dir, no m2), so offline resolution cannot supply one and an embedded
  * broker is equally impossible (the broker itself ships in the same
  * absent kafka jars). What IS executable is covered: SinksSpec drives
  * the SQS file transport through this exact builder INCLUDING `.load()`
  * end-to-end, asserts via reflection that the kafka/kinesis builders set
  * format and every option verbatim (a typo here would otherwise ship
  * silently), and pins the kafka `.load()` failure to the
  * data-source-lookup error — i.e. the first thing a deploying cluster's
  * classpath fixes.
  *
  * ENABLEMENT (deploying cluster, verbatim) — and once enabled, the
  * ready-made end-to-end proof is [[graft.streaming.KafkaIntegrationSpec]]
  * (cancels cleanly offline; runs unmodified against
  * tools/kafka/docker-compose.yml with
  * `-Dgraft.kafka.bootstrap=localhost:9092`):
  *   Kafka — add to spark-submit:
  *     --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2
  *   (pulls kafka-clients, spark-token-provider-kafka-0-10, commons-pool2
  *   transitively; version must match the Spark runtime exactly). Then
  *   `Connectors.kafkaReader(spark, "host:9092", "bids").load()` and pipe
  *   through [[decodeBidJson]]. One-line smoke test: produce a single JSON
  *   bid onto the topic and assert `decodeBidJson(df)` yields it with
  *   `startingOffsets=earliest` in a 1-trigger `writeStream` to memory.
  *   Kinesis — the structured-streaming connector is AWS Labs'
  *   spark-sql-kinesis-connector (github.com/awslabs/spark-sql-kinesis-connector);
  *   add its published jar for Scala 2.13 to the classpath, then
  *   `Connectors.kinesisReader(spark, "bids", "us-east-1").load()` through
  *   [[decodeBidKinesis]], smoke-tested the same way against a
  *   kinesis-mock/localstack `endpointUrl`.
  *
  * The decode chains are transport-independent pure-column transforms
  * (tested in SinksSpec over synthesized payload frames): every transport
  * lands on the same `bid` schema, mirroring how the reference funnels all
  * sources into one Arrow RecordBatch shape.
  */
object Connectors {
  /** Kafka bid-event source (reference kafka.rs:1-165): JSON payloads on a
    * topic → the NEXMark `bid` schema via from_json. Payload column: `value`
    * (binary).
    */
  def kafkaReader(spark: SparkSession, bootstrapServers: String,
      topic: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")

  /** Kinesis bid-event source (reference kinesis.rs:31-45 KinesisSource
    * {stream_name, window}): the Spark Kinesis connector exposes records as
    * `data` (binary), `partitionKey`, `sequenceNumber`,
    * `approximateArrivalTimestamp` — decode `data` with
    * [[decodeBidPayload]]. TRIM_HORIZON mirrors the reference's
    * replay-from-start local tests.
    */
  def kinesisReader(spark: SparkSession, streamName: String,
      region: String, endpointUrl: Option[String] = None): DataStreamReader = {
    val r = spark.readStream.format("kinesis")
      .option("streamName", streamName)
      .option("region", region)
      .option("initialPosition", "TRIM_HORIZON")
    endpointUrl.fold(r)(u => r.option("endpointUrl", u))
  }

  /** SQS payload source (reference sqs.rs; datasink/mod.rs lists SQS as a
    * queue transport): Spark has no first-party SQS source, so the
    * deployment shape is the S3-notification pattern — SQS carries object
    * notifications and the payload files land on S3, consumed by a
    * replayable file source (exactly-once, SinksSpec checkpoint test). For
    * direct message bodies, the `body` string column decodes through the
    * same chain.
    */
  def sqsBackedFileReader(spark: SparkSession, schema: StructType,
      path: String): DataStreamReader =
    spark.readStream.schema(schema).format("json")
      .option("path", path) // picked up by the no-arg `.load()`
      .option("maxFilesPerTrigger", 64) // bounded micro-batches at scale

  val bidJsonSchema: StructType = StructType(Seq(
    StructField("auction", IntegerType),
    StructField("bidder", IntegerType),
    StructField("price", IntegerType),
    StructField("b_date_time", TimestampType)))

  /** Decode a JSON payload column (bytes or string) into bid rows — the
    * same transform chain whatever the transport.
    */
  def decodeBidPayload(raw: DataFrame, payloadCol: String): DataFrame =
    raw.select(from_json(col(payloadCol).cast(StringType), bidJsonSchema).as("b"))
      .select(col("b.auction"), col("b.bidder"), col("b.price"),
        col("b.b_date_time"))

  /** Kafka: payload arrives in `value`. */
  def decodeBidJson(raw: DataFrame): DataFrame = decodeBidPayload(raw, "value")

  /** Kinesis: payload arrives in `data`. */
  def decodeBidKinesis(raw: DataFrame): DataFrame = decodeBidPayload(raw, "data")

  /** SQS message body: payload arrives in `body`. */
  def decodeBidSqs(raw: DataFrame): DataFrame = decodeBidPayload(raw, "body")

  /** TCP socket bid-event source — the one wire transport Spark ships
    * with zero extra jars, used to prove the decode chain against
    * GENUINELY external bytes (SocketTransportSpec feeds it from a real
    * ServerSocket). Payload column: `value` (string), one JSON bid per
    * line — decode with [[decodeBidJson]] exactly like Kafka.
    *
    * AT-LEAST-ONCE ONLY: the socket source has no offsets, so a
    * checkpoint restart cannot replay — rows in flight at a failure are
    * lost or duplicated. It is a decode-chain/integration transport, not
    * a production source; the exactly-once offset contract lives in the
    * V2 generator source (graft.sources.NexmarkV2) and, on a deploying
    * cluster, Kafka/Kinesis via the readers above.
    */
  def socketReader(spark: SparkSession, host: String,
      port: Int): DataStreamReader =
    spark.readStream.format("socket")
      .option("host", host)
      .option("port", port)
}
