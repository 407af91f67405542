package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-provided TESTDATA parquet tables (TESTDATA.md) and
  * registers them as temp views so catalog queries can be written either
  * with the DataFrame API or `spark.sql`.
  *
  * Capability mirror of the reference's table registration
  * (reference: flock/src/datasource/nexmark/mod.rs:102-141 registers named
  * MemTables; here sources are parquet scans so Catalyst gets pushdown,
  * pruning, and stats for free).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `dir` (no view registration).
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default; we read it as a nanos long and truncate to a µs timestamp —
    * exactly what DuckDB's `epoch_us(ts)` yields, keeping oracles aligned.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table in `dir` as a temp view named after the table.
    * Idempotent; cheap (schema read only — scans stay lazy).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
