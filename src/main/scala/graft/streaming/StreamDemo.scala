package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming smoke main (SURVEY §7.1 step 4): rate source →
  * NEXMark bid projection → q1 currency conversion → memory sink at a 1 s
  * trigger, then a windowed q7 pass over the same generated data in batch.
  * Prints row counts; exits nonzero if the pipeline produced nothing.
  *
  * Run: sbt "runMain graft.streaming.StreamDemo [seconds]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSecs = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = StreamQueries.q1(Nexmark.bidStream(spark, rowsPerSecond = 2000))
      .writeStream.format("memory").queryName("demo_q1")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second"))
      .start()
    Thread.sleep(runSecs * 1000L)
    q.stop()
    val streamed = spark.table("demo_q1").count()
    println(s"[demo] q1 rows streamed in ${runSecs}s: $streamed")

    val batchQ7 = StreamQueries.q7(Nexmark.bids(spark, 50000)).count()
    println(s"[demo] q7 tumbling-window rows (batch replay): $batchQ7")

    spark.stop()
    if (streamed == 0 || batchQ7 == 0) sys.exit(1)
  }
}
