package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third-formulation checks for the round-9 statistics entries: the
  * DuckDB oracle already cross-checks the SQL formulation, but both
  * engines could share a common-mode mistake in MY translation of the
  * statistic; these tests pin each entry to an independent NAIVE Scala
  * recompute over the collected rows (sorted-median, brute ECDF, direct
  * waterfill), plus a randomized property for the histogram-median
  * helper the MAD entry is built on.
  */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def halfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("median2ByKey == 2x naive sorted median over randomized multisets") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val rows = for {
        k <- 0 until 5
        n = 1 + rnd.nextInt(40)
        _ <- 0 until n
      } yield (s"k$k", (rnd.nextInt(20) - 5).toLong) // dups + negatives
      val got = operators.Pipeline
        .median2ByKey(rows.toDF("key", "v"), "key", "v", "m2")
        .select($"key", $"n", $"m2").as[(String, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      val expect = rows.groupBy(_._1).map { case (k, vs) =>
        val s = vs.map(_._2).sorted
        val n = s.length
        // two middle order statistics (1-based ⌊(n+1)/2⌋ and ⌊(n+2)/2⌋)
        k -> (n.toLong, s((n - 1) / 2) + s(n / 2))
      }
      assert(got == expect, s"trial $trial diverges")
    }
  }

  test("p114 MAD outliers == naive sorted median/MAD recompute") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      (s((n - 1) / 2) + s(n / 2)) / 2.0
    }
    val expect = docs.groupBy(_._1).map { case (src, rs) =>
      val vs = rs.map(_._2.toDouble).toSeq
      val m = med(vs)
      val mad = med(vs.map(v => math.abs(v - m)))
      src -> (vs.length.toLong, m, mad,
        vs.count(v => math.abs(v - m) > 3 * mad).toLong)
    }
    val got = Catalog.byName("p114_mad_outliers").run(spark, sf)
      .select($"source", $"n_docs", $"median_chars", $"mad_chars",
        $"n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == expect)
  }

  test("p115 waterfill == direct closed-form recompute; budget exactly spent") {
    val out = Catalog.byName("p115_budget_waterfill").run(spark, sf)
      .select($"source", $"lang", $"tok", $"allocated".cast("double"),
        $"capped")
      .as[(String, String, Long, Double, Boolean)].collect()
    val total = out.map(_._3).sum
    val budget = total * 6 / 10
    val srt = out.sortBy(r => (r._3, r._1, r._2))
    val n = srt.length
    // first index (0-based) whose full coverage overshoots
    var pfx = 0L
    var ip = -1
    for ((r, i) <- srt.zipWithIndex if ip < 0) {
      if (pfx + r._3 * (n - i) > budget) ip = i else pfx += r._3
    }
    assert(ip >= 0, "cap must bite at a 60% budget")
    val c = (budget - pfx).toDouble / (n - ip)
    srt.zipWithIndex.foreach { case (r, i) =>
      val expAlloc = if (i < ip) r._3.toDouble else halfUp(c, 4)
      assert(math.abs(r._4 - expAlloc) < 1e-9,
        s"${r._1}/${r._2}: allocated ${r._4} vs $expAlloc")
      assert(r._5 == (i >= ip), s"${r._1}/${r._2}: capped flag")
    }
    // Budget conservation (up to the 1e-4 decimal rounding per capped row)
    val spent = srt.zipWithIndex.map { case (r, i) =>
      if (i < ip) r._3.toDouble else c
    }.sum
    assert(math.abs(spent - budget) < 1e-6, s"spent $spent vs $budget")
  }

  test("p116 KS == brute-force ECDF max-gap recompute") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val xs = docs.map(_._2).distinct.sorted
    val na = docs.length
    val got = Catalog.byName("p116_ks_drift").run(spark, sf)
      .select($"source", $"ks".cast("double")).as[(String, Double)]
      .collect().toMap
    docs.groupBy(_._1).foreach { case (src, rs) =>
      val sv = rs.map(_._2)
      val ks = xs.map { x =>
        math.abs(sv.count(_ <= x).toDouble / sv.length -
          docs.count(_._2 <= x).toDouble / na)
      }.max
      assert(math.abs(got(src) - halfUp(ks, 6)) < 1e-9,
        s"$src: ${got(src)} vs $ks")
    }
  }

  test("p117 vocab growth == naive first-occurrence recompute") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
    val got = Catalog.byName("p117_vocab_growth").run(spark, sf)
      .select($"source", $"n_tokens", $"n_types", $"types_h1", $"types_h2")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    docs.groupBy(_._1).foreach { case (src, rs) =>
      val ids = rs.map(_._2.toDouble).toSeq.sorted
      val medId = (ids((ids.length - 1) / 2) + ids(ids.length / 2)) / 2.0
      val toks = rs.flatMap(r => r._3.split(" ", -1).map(t => (t, r._2)))
      val firsts = toks.groupBy(_._1).map { case (t, os) => os.map(_._2).min }
      val h1 = firsts.count(_ <= medId).toLong
      assert(got(src) == (toks.length.toLong, firsts.size.toLong, h1,
        firsts.size - h1), s"$src diverges")
    }
  }

  test("p119 Fano == naive integer dispersion recompute") {
    val ev = Tables.load(spark, sf, "events")
      .select($"event_type", $"user_id",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long, Long)].collect()
    val got = Catalog.byName("p119_event_burstiness").run(spark, sf)
      .select($"event_type", $"n_cells", $"n_events", $"fano_milli")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    ev.groupBy(_._1).foreach { case (t, rs) =>
      val cells = rs.groupBy(r => (r._2, r._3)).values.map(_.length.toLong)
      val n = cells.size.toLong
      val s1 = cells.sum
      val s2 = cells.map(x => x * x).sum
      val fano = Math.floorDiv((n * s2 - s1 * s1) * 1000, n * s1)
      assert(got(t) == (n, s1, fano), s"$t diverges")
    }
  }
}
