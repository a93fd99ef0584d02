package graft.plans

import graft.geo.Bbox
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Optimizer rule (SURVEY.md §7.2 "optional Rule sugar"): when a filter
  * contains [[EnvelopeIntersects]] over a plan whose output includes a
  * standard covering column (`bbox` struct with xmin/ymin/xmax/ymax double
  * leaves), replace the decode-per-row predicate with the expanded
  * bbox-column comparisons — exact test AND pushable superset, identical
  * algebra to GeoFunctions.bbox_intersects — so parquet row-group pruning
  * kicks in automatically.
  *
  * Semantics match the reference's extract: with a covering column present
  * the bbox decides membership (filter.go:238-270); without one the
  * expression's own decode path runs (filter.go:271-296).
  */
object PushBboxFilter extends Rule[LogicalPlan] {

  private def bboxField(plan: LogicalPlan): Option[Attribute] =
    plan.output.find { a =>
      a.name == "bbox" && (a.dataType match {
        case st: StructType =>
          Seq("xmin", "ymin", "xmax", "ymax").forall(n =>
            st.fields.exists(f => f.name == n && f.dataType == DoubleType))
        case _ => false
      })
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if cond.exists(_.isInstanceOf[EnvelopeIntersects]) =>
      bboxField(child) match {
        case Some(attr) =>
          val newCond = cond.transform {
            // the standard `bbox` column covers the PRIMARY geometry
            // column only — rewrite just filters on the conventionally
            // named primary attribute; filters on other geometry columns
            // keep their decode path
            case e @ EnvelopeIntersects(g: Attribute, box)
                if g.name == graft.meta.GeoMetadata.DefaultGeometryColumn =>
              expanded(attr, box)
          }
          if (newCond fastEquals cond) f else Filter(newCond, child)
        case None => f
      }
  }

  /** The expanded predicate over the bbox struct leaves (same algebra as
    * GeoFunctions.bbox_intersects).
    */
  private def expanded(attr: Attribute, box: Bbox): Expression = {
    val st = attr.dataType.asInstanceOf[StructType]
    def field(name: String): Expression =
      GetStructField(attr, st.fieldIndex(name), Some(name))
    def d(v: Double): Expression = Literal(v, DoubleType)

    val xmin = field("xmin"); val ymin = field("ymin")
    val xmax = field("xmax"); val ymax = field("ymax")
    val qxmin = d(box.unwrappedXmin)

    val dataCrosses = And(GreaterThan(xmin, d(0)), LessThan(xmax, d(0)))
    val axmin = If(dataCrosses, Subtract(xmin, d(360)), xmin)
    val latOverlap = And(
      GreaterThanOrEqual(ymax, d(box.ymin)), LessThanOrEqual(ymin, d(box.ymax)))
    val exact = And(And(latOverlap, GreaterThanOrEqual(xmax, qxmin)),
      LessThanOrEqual(axmin, d(box.xmax)))
    val pushable = And(And(latOverlap, GreaterThanOrEqual(xmax, qxmin)),
      Or(LessThanOrEqual(xmin, d(box.xmax)), dataCrosses))
    // EnvelopeIntersects is false (never null) for null input; leading
    // IsNotNull conjuncts keep that under NOT/OR and are themselves
    // pushable (a Coalesce wrapper would be opaque to the parquet
    // filter translator and kill the pushdown this rule exists for)
    val notNulls: Expression = Seq(xmin, ymin, xmax, ymax)
      .map(IsNotNull(_): Expression).reduce(And(_, _))
    And(notNulls, And(exact, pushable))
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — registers
  * the bbox pushdown rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushBboxFilter)
  }
}
