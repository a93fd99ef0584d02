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
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, key: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    require(valueCols.nonEmpty, "as-of join needs at least one right value column")
    require(!left.columns.contains("_ats") && !left.columns.contains("_side"),
      "left frame may not contain the reserved columns _ats/_side")
    val pCols = valueCols.map(prefix + _)
    pCols.foreach(c => require(!left.columns.contains(c),
      s"left frame already has a column named $c — pass a different prefix"))
    val lSel: Seq[Column] =
      left.columns.toSeq.map(col) ++
        Seq(col(leftTs).as("_ats"), lit(1).as("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(prefix + c))
    val rSel: Seq[Column] =
      left.columns.toSeq.map { c =>
        if (key.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        Seq(col(rightTs).as("_ats"), lit(0).as("_side")) ++
        valueCols.map(c => col(c).as(prefix + c))
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = pCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_ats", "_side")
  }
}
