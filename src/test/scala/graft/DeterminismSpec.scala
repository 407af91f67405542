package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run determinism: the driver hashes each query's output against
  * the DuckDB oracle in a FRESH run, so any query whose result can vary
  * between executions (arbitrary tie-breaks, partition-order-sensitive
  * values, un-ordered limits) would pass locally and fail at the gate.
  * Every catalog query is executed twice and the multisets must match.
  * (nx_q12 is excluded: its output includes processing-time windows by
  * construction; its catalog form aggregates them to deterministic counts,
  * which IS what the second run compares.)
  */
class DeterminismSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  for ((name, q) <- Catalog.byName.toSeq.sortBy(_._1)) {
    test(s"$name is run-to-run deterministic") {
      val a = q.run(spark, sf)
      val b = q.run(spark, sf)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$name produced different results across two runs")
    }
  }
}
