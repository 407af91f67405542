package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles in one pass. Value-identical to the HOF
  * formulation
  * `array_distinct(transform(sequence(1, size(w)-n+1), i -> concat_ws(' ',
  * slice(w, i, n))))` with `w = split(text, ' ')`:
  *   - split keeps empty tokens (`String.split(" ", -1)`),
  *   - distinct preserves first-occurrence order (LinkedHashSet),
  *   - fewer than n tokens → empty array.
  * Replaces three split() evaluations plus two array materializations per
  * row in the dedup pipeline's hottest path. Codegen emits one static call
  * to the companion's `compute` kernel (stays inside WholeStageCodegen).
  */
case class ShingleArray(child: Expression, n: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  import org.apache.spark.sql.graft.shims.{column, expression}

  /** Static kernel, called from both interpreted eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def shingles(text: Column, n: Int = 3): Column =
    column(ShingleArray(expression(text), n))
}
