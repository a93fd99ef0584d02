package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator inventory (SURVEY.md §2) expressed as named queries over the
  * driver's synthetic tables, each paired with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (FIXTURES.md): every query ends in orderBy on a unique
  * key; doubles are rounded to fixed decimals on BOTH sides; column names
  * match the oracle exactly.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** q1_agg — pricing-summary-style aggregation (SURVEY §2.4 A1/A2 shape).
    * Partial (map-side) aggregation + single shuffle on the group keys; at
    * 100 TB this is the canonical scalable agg: 2-col group key, bounded
    * cardinality (6 groups), no skew.
    */
  val q1Agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
