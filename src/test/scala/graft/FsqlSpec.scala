package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shell semantics of the fsql front-end (reference flock-cli/src/
  * fsql.rs:29-71): accumulate-until-';', errors print and continue,
  * quit/exit only acts between statements — driven through a scripted
  * line source so the whole loop is exercised without a TTY.
  */
class FsqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("fsql: multi-line statements execute, errors continue, exit stops") {
    Fsql.registerViews(spark, "/root/testdata/sf0.001")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    Fsql.runLines(spark, Iterator(
      "SELECT l_returnflag, count(1) AS n FROM lineitem",
      "GROUP BY 1 ORDER BY 1;",
      "SELECT broken FROM nowhere;",
      "SELECT count(*) AS n_bids FROM bids;",
      "exit",
      "SELECT 1;" // must never run
    ), out += _)
    assert(out.length == 3, s"expected 3 outputs, got: $out")
    assert(out(0).linesIterator.next() == "l_returnflag\tn")
    assert(out(0).linesIterator.size >= 4) // header + >=2 flags + trailer
    assert(out(1).startsWith("error:"), s"bad-SQL output: ${out(1)}")
    // Generator registered and deterministic: N/50*46 bids.
    assert(out(2).contains("92000"), s"bids count output: ${out(2)}")
  }

  test("fsql: exit inside an open statement is SQL text, not a command") {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    Fsql.runLines(spark, Iterator(
      "SELECT 1 AS x FROM (SELECT 1)",
      "exit", // table alias for the subquery, as the reference accumulates
      ";"), out += _)
    assert(out.length == 1 && out(0).startsWith("x\n1"), s"got: $out")
  }

  test("fsql: leading-whitespace exit is SQL text (trailing-only trim)") {
    // fsql.rs is_exit_command trims only trailing whitespace, so
    // "  exit" is accumulated as SQL there — and must be here.
    assert(!Fsql.isExit("  exit"))
    assert(Fsql.isExit("exit  ") && Fsql.isExit("quit\t") &&
      Fsql.isExit("EXIT"))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    Fsql.runLines(spark, Iterator(
      "SELECT 1 AS x FROM (SELECT 1)",
      "  exit", // NOT an exit — leading whitespace makes it SQL text
      ";",
      "exit",
      "SELECT 2;" // must never run
    ), out += _)
    assert(out.length == 1 && out(0).startsWith("x\n1"), s"got: $out")
  }

  test("fsql: row cap renders a first-N trailer") {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    Fsql.runLines(spark,
      Iterator("SELECT id FROM range(100) ORDER BY id;"), out += _,
      maxRows = 5)
    assert(out(0).linesIterator.size == 7) // header + 5 rows + trailer
    assert(out(0).endsWith("(first 5 rows)"), s"got: ${out(0)}")
  }
}
