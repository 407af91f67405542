package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog lives in graft.Catalog; modules:
  *   - operators.Relational   — SURVEY §2.A relational inventory
  *   - operators.EventWindows — SURVEY §2.C window semantics (batch-checked)
  *   - operators.Pipeline     — dedup / similarity / text-analysis ops
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * p20 is the engine's showcase: the full curation pipeline (quality
    * gate → exact dedup → LSH near-dup removal → per-language stats) as
    * one declarative plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("p20_pipeline_e2e").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
