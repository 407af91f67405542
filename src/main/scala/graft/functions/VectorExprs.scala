package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two float-vector columns as a native Catalyst
  * expression with whole-stage codegen — the hot inner loop of brute-force
  * similarity search (SURVEY north-star "similarity search" operator).
  *
  * Semantics are bit-identical to the sequential-fold SQL formulation used
  * by the DuckDB oracle (Catalog determinism rules): one left-to-right pass
  * accumulating dot/na/nb in double, then dot / (sqrt(na)*sqrt(nb)).
  *
  * Preference order per the build guide: this is tier (b) — a custom
  * `Expression` beats composing `aggregate(sequence(...))` higher-order
  * functions (which don't participate in codegen and re-walk the array per
  * fold step), and beats any UDF (no serialization boundary).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity needs two array<float> inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $x.getFloat($i);
          double $yi = (double) $y.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 60-bit SimHash over an array of 60-bit token hashes: per-bit signed
  * vote, sign → bit. Single compiled pass replaces the O(60·n) interpreted
  * higher-order-function fold (which showed up as the slowest pipeline op
  * in the first bench pass). Deterministic — matches the SQL/DuckDB
  * formulation bit for bit.
  */
case class SimHash60(child: Expression) extends Expression
    with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 needs array<bigint>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val hs = v.asInstanceOf[ArrayData]
      val counts = new Array[Int](60)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 60) {
        if (counts(j) >= 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val hs = childGen.value
    val counts = ctx.freshName("counts")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val out = ctx.freshName("out")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          int[] $counts = new int[60];
          for (int $i = 0; $i < $hs.numElements(); $i++) {
            long $h = $hs.getLong($i);
            for (int $j = 0; $j < 60; $j++) {
              if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
          long $out = 0L;
          for (int $j = 0; $j < 60; $j++) {
            if ($counts[$j] >= 0) $out |= (1L << $j);
          }
          ${ev.value} = $out;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed-random-projection LSH bucket over a 64-dim float vector with
  * `nPlanes` hyperplanes. The plane matrix is md5-derived (plane[j][i] =
  * top-60-bits(md5("j_i")) / 2^60 − 0.5 — the same values the SQL/DuckDB
  * formulation computes inline) but materialized ONCE statically, so the
  * per-row cost is nPlanes·dim multiply-adds instead of nPlanes·dim md5
  * calls. Fold order (i ascending per plane) matches the SQL sequential
  * fold → bit-identical buckets.
  *
  * Codegen: emits one static call to the companion's `bucket` kernel, so
  * the expression stays inside the surrounding WholeStageCodegen span.
  */
case class LshBucket(child: Expression, nPlanes: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket needs array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    LshBucket.bucket(v.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBucket.bucket($c, $nPlanes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Static kernel, called from both interpreted eval and generated code. */
  def bucket(x: ArrayData, nPlanes: Int): Int = {
    val planes = LshBucket.planes(nPlanes, x.numElements())
    var bucket = 0
    var j = 0
    while (j < nPlanes) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      while (i < p.length) {
        dot += x.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (dot >= 0.0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** plane[j][i] = top-60-bits(md5(s"${j}_${i+1}")) / 2^60 − 0.5 — matches
    * the inline SQL formulation over sequence(1, dim).
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(np) { j =>
        Array.tabulate(d) { i0 =>
          md.reset()
          val dig = md.digest(s"${j}_${i0 + 1}".getBytes("UTF-8"))
          var l0 = 0L
          var b = 0
          while (b < 8) { l0 = (l0 << 8) | (dig(b) & 0xffL); b += 1 }
          (l0 >>> 4).toDouble / 1152921504606846976.0 - 0.5
        }
      }
    })
}

/** Squared L2 distance over one aligned slice [start, start+len) of two
  * float vectors — the product-quantization inner loop (per-subspace
  * distance from a query/vector sub-slice to a sub-codebook centroid).
  *
  * Static start/len (one compiled kernel per subspace geometry, like
  * LshBucket's nPlanes) and a single left-to-right double accumulation so
  * the DuckDB fold over range(start+1, start+len+1) reproduces the value
  * bit for bit. A native expression rather than
  * `aggregate(zip_with(slice, slice))` keeps the encode scan — M·K of
  * these per row — inside WholeStageCodegen with no per-step array
  * re-walk.
  */
case class SubvectorL2(left: Expression, right: Expression,
    start: Int, len: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subvector_l2 needs two array<float> inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val end = math.min(math.min(x.numElements(), y.numElements()), start + len)
    var acc = 0.0
    var i = start
    while (i < end) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val end = ctx.freshName("end")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $end = java.lang.Math.min(
          java.lang.Math.min($x.numElements(), $y.numElements()), $start + $len);
        double $acc = 0.0;
        for (int $i = $start; $i < $end; $i++) {
          double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the custom expressions. */
object VectorFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def simhash60(tokenHashes: Column): Column =
    column(SimHash60(expression(tokenHashes)))

  def lsh_bucket(vec: Column, nPlanes: Int = 4): Column =
    column(LshBucket(expression(vec), nPlanes))

  def subvector_l2(a: Column, b: Column, start: Int, len: Int): Column =
    column(SubvectorL2(expression(a), expression(b), start, len))
}
