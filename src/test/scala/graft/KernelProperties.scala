package graft

import graft.functions.{MinHashShingleSig, ShingleArray, SpaceSavingSketch}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks over the PURE kernels (no SparkSession): the
  * static shingle/minhash functions that generated code calls, and the
  * SpaceSaving sketch. Each property pins the kernel to an independent
  * naive formulation over randomized inputs — the generative complement
  * to FunctionsSpec's fixed-corpus parity tests.
  */
object KernelProperties extends Properties("graft.kernels") {

  private val word =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def naiveShingles(t: String): Seq[String] = {
    val w = t.split(" ", -1).toSeq
    if (w.length < 3) Seq.empty
    else w.sliding(3).map(_.mkString(" ")).toSeq.distinct
  }

  property("shingles == naive sliding-window distinct") = forAll(text) { t =>
    val got = ShingleArray.compute(UTF8String.fromString(t), 3)
    (0 until got.numElements()).map(got.getUTF8String(_).toString) == naiveShingles(t)
  }

  property("minhash == min over md5 double-hash of all shingle windows") =
    forAll(text) { t =>
      val got = MinHashShingleSig.compute(UTF8String.fromString(t), 4)
      val w = t.split(" ", -1).toSeq
      if (w.length < 3) got == null
      else {
        val hashes = w.sliding(3).map(_.mkString(" ")).map { s =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (java.lang.Long.parseLong(hex.substring(0, 15), 16),
            java.lang.Long.parseLong(hex.substring(16, 31), 16))
        }.toSeq
        (0 until 4).forall { i =>
          got.getLong(i) == hashes.map { case (h1, h2) => h1 ^ (i.toLong * h2) }.min
        }
      }
    }

  // Adversarial text: unicode words (CJK, emoji, combining marks), empty
  // tokens from repeated/leading/trailing spaces, and long words — the
  // shapes a real web corpus throws at the dedup kernels.
  private val unicodeWord = Gen.oneOf(
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n,
        Gen.oneOf("中", "文", "語", "ß", "é", "ö", "🎉", "x"))
        .map(_.mkString)),
    Gen.const(""), // empty token (double space in the joined text)
    Gen.listOfN(64, Gen.alphaChar).map(_.mkString))
  private val unicodeText =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, unicodeWord)).map(_.mkString(" "))

  property("shingles handle unicode and empty tokens like the naive form") =
    forAll(unicodeText) { t =>
      val got = ShingleArray.compute(UTF8String.fromString(t), 3)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == naiveShingles(t)
    }

  property("minhash handles unicode and empty tokens like the naive form") =
    forAll(unicodeText) { t =>
      val got = MinHashShingleSig.compute(UTF8String.fromString(t), 4)
      val w = t.split(" ", -1).toSeq
      if (w.length < 3) got == null
      else {
        val hashes = w.sliding(3).map(_.mkString(" ")).map { s =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (java.lang.Long.parseLong(hex.substring(0, 15), 16),
            java.lang.Long.parseLong(hex.substring(16, 31), 16))
        }.toSeq
        (0 until 4).forall { i =>
          got.getLong(i) == hashes.map { case (h1, h2) => h1 ^ (i.toLong * h2) }.min
        }
      }
    }

  private val stream = Gen.listOf(Gen.chooseNum(0L, 50L))
  private def naiveCounts(xs: List[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  property("sketch is exact when capacity covers the key space") =
    forAll(stream) { xs =>
      val sk = new SpaceSavingSketch(64) // key space is 0..50 < 64
      xs.foreach(sk.add)
      sk.nSeen == xs.length &&
        sk.counters.map { case (v, (c, _)) => v -> c }.toMap == naiveCounts(xs)
    }

  property("sketch counts overestimate within err at ANY capacity") =
    forAll(stream, Gen.chooseNum(1, 8)) { (xs, cap) =>
      val sk = new SpaceSavingSketch(cap)
      xs.foreach(sk.add)
      val truth = naiveCounts(xs)
      sk.counters.forall { case (v, (c, e)) =>
        val t = truth.getOrElse(v, 0L)
        c >= t && c - e <= t
      }
    }

  property("sketch merge == single sketch in the exact regime") =
    forAll(stream, stream) { (a, b) =>
      val merged = new SpaceSavingSketch(128)
      val other = new SpaceSavingSketch(128)
      a.foreach(merged.add)
      b.foreach(other.add)
      merged.mergeWith(other)
      val single = new SpaceSavingSketch(128)
      (a ++ b).foreach(single.add)
      merged.nSeen == single.nSeen && merged.counters == single.counters
    }

  property("sketch stays exact at the distinct == capacity boundary") =
    // r03 advice: inferring saturation from `size >= capacity` gave a
    // sketch that saw EXACTLY capacity distinct keys (no eviction) a
    // nonzero merge floor, injecting error where absence means zero. The
    // explicit `evicted` flag must keep this case exact through merges.
    forAll(stream, stream) { (a0, b0) =>
      val cap = 51 // key space is 0..50 — fill it completely on both sides
      val a = a0 ++ (0L to 50L)
      val b = b0 ++ (0L to 50L)
      val sa = new SpaceSavingSketch(cap)
      val sb = new SpaceSavingSketch(cap)
      a.foreach(sa.add)
      b.foreach(sb.add)
      sa.mergeWith(sb)
      !sa.evicted &&
        sa.counters.map { case (v, (c, _)) => v -> c }.toMap ==
          naiveCounts(a ++ b) &&
        sa.counters.forall { case (_, (_, e)) => e == 0L }
    }

  property("sketch serde roundtrip is lossless in every regime") =
    // The serialized form crosses the RocksDB state-store boundary in the
    // streaming twins (SpaceSavingProcessor, StreamSketches) — a lossy
    // field (nSeen, evicted, per-key err) would silently corrupt restarts.
    forAll(stream, Gen.chooseNum(1, 64)) { (xs, cap) =>
      val sk = new SpaceSavingSketch(cap)
      xs.foreach(sk.add)
      val rt = SpaceSavingSketch.deserialize(SpaceSavingSketch.serialize(sk))
      rt.nSeen == sk.nSeen && rt.evicted == sk.evicted &&
        rt.counters == sk.counters &&
        rt.topK(3).toSeq == sk.topK(3).toSeq
    }

  property("merged sketch keeps the bound in the APPROXIMATE regime") =
    // Small capacities force evictions on both sides before the merge —
    // the regime where the pre-fix merge undercounted keys evicted from
    // one shard but surviving the other (round-2 advice). The mergeable-
    // summaries floor rule must keep true <= count <= count - err + err,
    // i.e. c >= t and c - e <= t, for every surviving key.
    forAll(stream, stream, Gen.chooseNum(1, 6)) { (a, b, cap) =>
      val sa = new SpaceSavingSketch(cap)
      val sb = new SpaceSavingSketch(cap)
      a.foreach(sa.add)
      b.foreach(sb.add)
      sa.mergeWith(sb)
      val truth = naiveCounts(a ++ b)
      sa.nSeen == (a.length + b.length) &&
        sa.counters.forall { case (v, (c, e)) =>
          val t = truth.getOrElse(v, 0L)
          c >= t && c - e <= t
        }
    }

  property("sketch byte codec round-trips") =
    forAll(stream, Gen.chooseNum(1, 8)) { (xs, cap) =>
      val sk = new SpaceSavingSketch(cap)
      xs.foreach(sk.add)
      val rt = SpaceSavingSketch.deserialize(SpaceSavingSketch.serialize(sk))
      rt.capacity == sk.capacity && rt.nSeen == sk.nSeen &&
        rt.counters == sk.counters
    }
}
