package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native L2 unit-normalization of a float/double array, computed in
  * double; a zero vector passes through as doubles unchanged (cosine
  * against it is defined as 0 downstream).
  *
  * The column-algebra form `transform(v, x -> x / sqrt(dot(v, v)))`
  * re-evaluates the O(dim) norm INSIDE the lambda — Catalyst performs no
  * common-subexpression elimination across higher-order-function lambda
  * bodies (the same trap documented at
  * [[graft.llm.Dedup.minhashSignatureFromHashes]]), so the per-row cost
  * is O(dim²) interpreted. This is one primitive two-pass loop (norm,
  * then divide) inside whole-stage codegen: the prepare kernel of every
  * cosine stage (near-dup, semantic dedup, IVF, decontamination).
  */
object ArrayNormalizeKernel {
  def normalize(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var acc = 0d
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      out(i) = x
      i += 1
    }
    if (acc != 0d) {
      val norm = math.sqrt(acc)
      i = 0
      while (i < n) {
        out(i) = out(i).asInstanceOf[Double] / norm
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class ArrayNormalize(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_normalize needs a float/double array, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    ArrayNormalizeKernel.normalize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArrayNormalizeKernel.normalize($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): ArrayNormalize =
    copy(child = newChild)
}
