package graft.plans

import graft.geo.Bbox
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Optimizer rule (SURVEY.md §7.2 "optional Rule sugar"): when a filter
  * contains [[EnvelopeIntersects]] over a plan that carries a *trusted*
  * covering bbox column, replace the decode-per-row predicate with expanded
  * bbox-column comparisons — exact test AND pushable superset, identical
  * algebra to GeoFunctions.bbox_intersects — so parquet row-group pruning
  * kicks in automatically.
  *
  * Trust is established by provenance, not by column name: only columns
  * stamped with the [[PushBboxFilter.CoveringTag]] attribute metadata (done
  * by GeoParquet.read when the file context declares the covering —
  * mirroring the reference, which only consults bbox within a GeoParquet
  * file, geoparquet.go:233-254) are rewritten onto. An arbitrary frame that
  * merely *has* a column named "bbox" is left alone.
  *
  * Null safety: a row whose bbox is null but whose geometry is not falls
  * back to the decode path (`If(anyNull, decode, exact)`) instead of being
  * dropped; the pushable conjunct admits null-bbox rows via
  * `Or(isnull, …)`, which Parquet can still evaluate against null counts.
  */
object PushBboxFilter extends Rule[LogicalPlan] {

  /** Attribute-metadata key: marks a bbox struct column as the trusted
    * covering for the geometry column named by the value. Stamped by
    * GeoParquet.read.
    */
  val CoveringTag = "graft.covering"

  def isBboxStruct(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case st: StructType =>
        Seq("xmin", "ymin", "xmax", "ymax").forall(n =>
          st.fields.exists(f => f.name == n && f.dataType == DoubleType))
      case _ => false
    }

  /** The trusted covering column in this plan's output, with the name of
    * the geometry column it covers.
    */
  private def coveringField(plan: LogicalPlan): Option[(Attribute, String)] =
    plan.output.collectFirst {
      case a if a.metadata.contains(CoveringTag) && isBboxStruct(a.dataType) =>
        (a, a.metadata.getString(CoveringTag))
    }

  private def hasRewritable(cond: Expression): Boolean =
    cond.exists {
      case e: EnvelopeIntersects => e.rewritable
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if hasRewritable(cond) =>
      coveringField(child) match {
        case Some((attr, geomName)) =>
          val newCond = cond.transform {
            // the covering column covers exactly the geometry column the
            // metadata names; filters on other geometry columns keep
            // their decode path
            case e @ EnvelopeIntersects(g: Attribute, _, true)
                if g.name == geomName =>
              expanded(attr, e)
          }
          if (newCond fastEquals cond) f else Filter(newCond, child)
        case None => f
      }
  }

  /** The expanded predicate over the bbox struct leaves (same algebra as
    * GeoFunctions.bbox_intersects) with a decode fallback for null bbox.
    */
  private def expanded(attr: Attribute, orig: EnvelopeIntersects): Expression = {
    val box: Bbox = orig.box
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
    // any-null escape hatch: rows with a null covering value must not be
    // pruned — they fall through to the decode path below. Or(isnull, cmp)
    // is still parquet-translatable (null counts + min/max), so row groups
    // with zero nulls and non-intersecting stats are skipped.
    val anyNull: Expression = Seq(xmin, ymin, xmax, ymax)
      .map(IsNull(_): Expression).reduce(Or(_, _))
    val pushable = Or(anyNull,
      And(And(latOverlap, GreaterThanOrEqual(xmax, qxmin)),
        Or(LessThanOrEqual(xmin, d(box.xmax)), dataCrosses)))
    val residual = If(anyNull, orig.copy(rewritable = false), exact)
    And(pushable, residual)
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
