package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI drift report: identical distributions score ~0, a shifted source
  * scores high, and the bin grid is dense (empty bins contribute their
  * smoothed mass instead of disappearing).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, Long)]) = rows.toDF("source", "len")

  test("a source distributed like the corpus has PSI near zero; a shifted one scores high") {
    // q is the CORPUS distribution, so the shifted source must be a
    // small minority or it drags the baseline with it: 1000 uniform
    // docs vs 10 concentrated ones
    val rows =
      (1 to 500).map(i => ("same", (i % 10) * 200L + 50)) ++
      (1 to 500).map(i => ("other", (i % 10) * 200L + 50)) ++
      (1 to 10).map(_ => ("hi", 1950L))
    val out = Drift.psiBySource(mk(rows), col("source"), col("len"),
      binWidth = 200L, bins = 10)
    val psi = out.select("source", "psi").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psi("same") < 0.1, s"uniform source drifted: ${psi("same")}")
    assert(psi("hi") > 1.0, s"concentrated source should scream: ${psi("hi")}")
    assert(psi("same") === psi("other"))
  }

  test("grid is dense: every source gets exactly `bins` rows, empty bins smoothed") {
    val rows = Seq(("a", 0L), ("a", 10L), ("b", 1999L))
    val out = Drift.psiBySource(mk(rows), col("source"), col("len"), 200L, 10)
      .collect()
    assert(out.length === 20)
    val aRows = out.filter(_.getString(0) == "a")
    assert(aRows.length === 10)
    // bin 9 has no 'a' docs but still carries smoothed p > 0
    val a9 = aRows.find(_.getInt(1) == 9).get
    assert(a9.getAs[Long]("n_sb") === 0L && a9.getAs[Double]("p") > 0.0)
    // values past the last bin edge clamp into the top bin
    val b9 = out.filter(r => r.getString(0) == "b" && r.getInt(1) == 9).head
    assert(b9.getAs[Long]("n_sb") === 1L)
  }
}
