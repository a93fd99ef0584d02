package graft.plans

import graft.geo.{Bbox, GeoCodec}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Predicate: does the WKB geometry's envelope intersect the query box
  * (antimeridian-aware, reference filter.go:271-296)?
  *
  * Evaluable on its own (decode → envelope → intersect), so it is always
  * correct; the [[PushBboxFilter]] optimizer rule additionally rewrites it
  * into pushable bbox-column comparisons when the scan carries a covering
  * bbox struct — turning the full-scan fallback into the row-group-pruned
  * path without the user changing their query.
  */
object EnvelopeIntersectsKernel {
  def eval(wkb: Array[Byte], xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean = {
    val env = GeoCodec.envelope(GeoCodec.decodeWkb(wkb))
    env != null && env.intersects(Bbox(xmin, ymin, xmax, ymax))
  }
}

/** @param rewritable false marks a copy embedded by [[PushBboxFilter]] as
  *                    the null-bbox fallback branch, so the optimizer rule
  *                    reaches a fixed point instead of rewriting its own
  *                    output forever.
  */
case class EnvelopeIntersects(child: Expression, box: Bbox,
    rewritable: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else EnvelopeIntersectsKernel.eval(v.asInstanceOf[Array[Byte]],
      box.xmin, box.ymin, box.xmax, box.ymax)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val args: String =
      s"${box.xmin}D, ${box.ymin}D, ${box.xmax}D, ${box.ymax}D"
    ev.copy(code =
      code"""
         |${c.code}
         |boolean ${ev.value} = false;
         |if (!${c.isNull}) {
         |  ${ev.value} = graft.plans.EnvelopeIntersectsKernel.eval(${c.value}, $args);
         |}
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): EnvelopeIntersects =
    copy(child = newChild)
}
