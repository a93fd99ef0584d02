package graft.functions

import graft.geo.GeoCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry

/** Native Catalyst expressions for the WKB hot path (SURVEY.md §7.2:
  * "upgrade hot ones to Catalyst Expression only if bench demands").
  *
  * Compared to a Scala UDF these skip the encoder round-trip (binary →
  * Scala Option[tuple] → Catalyst struct) and generate a direct static
  * call inside whole-stage codegen, keeping the surrounding stage fused.
  * Decode still runs on the JVM heap via JTS — the win is plumbing, not
  * the parser.
  */
object WkbExpr {

  /** Static entry points referenced from generated code. */
  def envelope(wkb: Array[Byte]): InternalRow = {
    val geom = GeoCodec.decodeWkb(wkb)
    if (geom == null || geom.isEmpty) return null
    val e = geom.getEnvelopeInternal
    InternalRow(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
  }

  def geometryType(wkb: Array[Byte]): UTF8String = {
    val geom = GeoCodec.decodeWkb(wkb)
    if (geom == null) null else UTF8String.fromString(GeoCodec.geoJsonType(geom))
  }

  val envelopeType: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
}

/** WKB → struct(xmin,ymin,xmax,ymax); null for null/empty input. */
case class WkbEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WkbExpr.envelopeType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    WkbExpr.envelope(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WkbExpr.envelope($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WkbEnvelope =
    copy(child = newChild)
}

/** WKB → GeoJSON type name (Z-aware); null-safe. */
case class WkbGeometryType(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    WkbExpr.geometryType(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WkbExpr.geometryType($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WkbGeometryType =
    copy(child = newChild)
}
