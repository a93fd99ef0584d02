package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the event-enrichment operator the
  * reference lacks entirely (SURVEY §2.3: none), expressed Spark-first:
  * each left row gains the latest right row with the same key and
  * `right.ts <= left.ts` (inclusive, like DuckDB's ASOF JOIN which the
  * oracle uses).
  *
  * Shape: tag sides, union, ONE window pass per key carrying the right
  * values forward (`last(..., ignoreNulls)` over rows-unbounded-preceding),
  * keep left rows. A single shuffle on the join key — no range join, no
  * per-row binary search, no broadcast requirement — so it scales to
  * arbitrarily large both sides and skew behaves like any keyed window.
  *
  * Ties: at equal timestamps the right row sorts first, so it is visible
  * to the left row. Multiple right rows on the same (key, ts) are
  * order-ambiguous — pre-aggregate the right side to one row per
  * (key, ts) for deterministic output.
  *
  * NULL semantics match DuckDB ASOF: the values are carried as ONE struct
  * per right row, so `last(…, ignoreNulls)` selects the latest right ROW —
  * a matched row whose value column is genuinely NULL yields NULL, rather
  * than skipping back to an older non-null value (which a per-column
  * ignoreNulls fill would silently do).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    require(valueCols.nonEmpty, "as-of join needs at least one right value column")
    Seq("_ats", "_side", "_aval").foreach(c => require(!left.columns.contains(c),
      s"left frame may not contain the reserved column $c"))
    val pCols = valueCols.map(prefix + _)
    pCols.foreach(c => require(!left.columns.contains(c),
      s"left frame already has a column named $c — pass a different prefix"))
    val avalType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lSel: Seq[Column] =
      left.columns.toSeq.map(col) ++
        Seq(col(leftTs).as("_ats"), lit(1).as("_side"),
          lit(null).cast(avalType).as("_aval"))
    val rSel: Seq[Column] =
      left.columns.toSeq.map { c =>
        if (key.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        Seq(col(rightTs).as("_ats"), lit(0).as("_side"),
          struct(valueCols.map(c => col(c).as(c)): _*).as("_aval"))
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_aval", last(col("_aval"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.toSeq.map(col) ++
        valueCols.zip(pCols).map { case (c, p) => col("_aval").getField(c).as(p) }: _*)
  }
}
