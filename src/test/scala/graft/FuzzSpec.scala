package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Guards the differential SQL fuzzer (SqlFuzz): the committed corpus at
  * tools/sqlfuzz/corpus.json is the EXACT text the 550-seed differential
  * run was green against (sf0.01 and sf0.1, tools/check.py, zero fails,
  * zero triage) — so the generator must keep reproducing it byte-for-byte,
  * or the corpus must be consciously re-dumped and re-verified.
  */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("generate(seed) is a pure function of the seed") {
    (1 to 40).foreach { s =>
      assert(SqlFuzz.generate(s) == SqlFuzz.generate(s), s"seed $s drifted")
    }
  }

  test("committed corpus reproduces byte-for-byte from the seeds") {
    val committed = Files.readString(Paths.get("tools/sqlfuzz/corpus.json"))
    val derived = SqlFuzz.corpusJson(SqlFuzz.DefaultSeeds)
    assert(derived == committed,
      "generator output no longer matches tools/sqlfuzz/corpus.json — " +
        "re-dump with `runMain graft.SqlFuzz --dump tools/sqlfuzz/corpus.json`" +
        " and re-run the differential gate before committing")
  }

  test("corpus exercises every shape family") {
    val all = (1 to SqlFuzz.DefaultSeeds).map(SqlFuzz.generate)
    def n(p: String => Boolean) = all.count(p)
    assert(n(_.contains(" JOIN ")) > 100, "join coverage")
    assert(n(_.contains("GROUP BY")) > 100, "aggregate coverage")
    assert(n(s => s.contains("UNION") || s.contains("INTERSECT") ||
      s.contains("EXCEPT")) > 30, "set-op coverage")
    assert(n(_.contains("(SELECT")) > 60, "subquery coverage")
    assert(n(_.contains(" IN (SELECT")) > 15, "IN-subquery coverage")
    assert(n(_.contains("EXISTS")) > 15, "EXISTS coverage")
    assert(n(_.contains("OVER (")) > 15, "window coverage")
    assert(n(s => s.contains("ROLLUP") || s.contains("CUBE")) > 10,
      "rollup/cube coverage")
    assert(n(_.contains("LIMIT")) > 10, "order-limit coverage")
    assert(n(_.startsWith("WITH")) > 5, "CTE coverage")
    assert(n(_.contains("LEFT JOIN")) > 20, "outer-join coverage")
    // v2 grammar (seeds 551-1000)
    assert(n(_.contains("ROWS BETWEEN")) > 40, "framed-window coverage")
    assert(n(_.contains("GROUPING SETS")) > 40, "grouping-sets coverage")
    assert(n(v => v.indexOf("(SELECT", v.indexOf("(SELECT") + 1) > 0) > 60,
      "nested-subquery coverage")
    assert(n(_.contains("COALESCE(agg.cnt")) > 40, "multi-CTE coverage")
    // v3 grammar (seeds 1001-1300)
    assert(n(_.contains("FULL OUTER JOIN")) > 15, "full-outer coverage")
    assert(n(_.contains("RIGHT JOIN")) > 10, "right-join coverage")
    assert(n(_.contains("NOT EXISTS")) > 10, "not-exists coverage")
    assert(n(_.contains("ESCAPE")) > 5, "like-escape coverage")
    assert(n(_.contains("SUBSTRING(")) > 10, "substring coverage")
    assert(n(_.contains("POSITION(")) > 10, "position coverage")
    assert(n(_.contains("date_trunc")) > 20, "date-trunc coverage")
    assert(n(_.contains("INTERVAL")) > 20, "interval-arith coverage")
    assert(n(s => s.contains("INTERSECT ALL") || s.contains("EXCEPT ALL")) > 5,
      "multiset-set-op coverage")
    assert(n(_.contains("RANGE BETWEEN")) > 20, "range-frame coverage")
    // v4 grammar (seeds 1301-1600)
    assert(n(_.contains("NULLS FIRST")) + n(_.contains("NULLS LAST")) > 20,
      "nulls-ordering coverage")
    assert(n(_.contains("NULLIF(")) > 30, "nullif derived-null coverage")
    assert(n(_.contains("IS NOT DISTINCT FROM")) >= 3,
      "null-safe comparison coverage")
    assert(n(_.contains("AND (CASE WHEN")) > 20, "case-in-join coverage")
    assert(n(_.contains("AS cs0")) > 20,
      "correlated scalar-SELECT coverage")
    assert(n(s => s.contains("HAVING") && (s.contains("HAVING CAST(SUM") ||
      s.contains("HAVING MIN(") || s.contains("HAVING (") ||
      s.contains("HAVING MAX("))) > 25, "rich-HAVING coverage")
    assert(n(_.contains("COUNT(v)")) > 20, "count-col-vs-star coverage")
    // v3 fan-out guard: every second-fact attachment carries a BETWEEN
    // range on its key (the guard renders as "tN.<key> BETWEEN a AND b").
    val v3 = (SqlFuzz.V2Seeds + 1 to SqlFuzz.DefaultSeeds).map(SqlFuzz.generate)
    val fanout = v3.filter(s => s.contains(" t3 ON t3.") || s.contains(" t4 ON t4."))
    // Match the guard's own rendering (alias.key BETWEEN lo AND hi), not
    // a bare " BETWEEN " that a coincidental random predicate could
    // satisfy if the guard regressed.
    val guardRe =
      """t\d+\.(c_custkey|s_suppkey|n_nationkey|o_orderkey|l_orderkey|p_partkey|r_regionkey) BETWEEN \d+ AND \d+""".r
    assert(fanout.forall(s => guardRe.findFirstIn(s).isDefined),
      "fan-out guard present (guard-specific rendering)")
    assert(fanout.nonEmpty, "fan-out chains still generated (guarded)")
  }

  test("a seed sample executes through spark.sql (sf0.001)") {
    Tables.all.foreach(t =>
      Tables.load(spark, "/root/testdata/sf0.001", t)
        .createOrReplaceTempView(t))
    // Every 23rd seed: 24 queries across the shape mix, fast enough for
    // the suite; the full 550-seed differential gate runs via the main.
    (1 to SqlFuzz.DefaultSeeds by 23).foreach { s =>
      val sql = SqlFuzz.generate(s)
      val df = spark.sql(sql)
      df.collect() // must execute, not just parse
    }
  }
}
