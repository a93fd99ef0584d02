package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population-stability-index drift report — the standard "did this
  * source's distribution shift against the corpus?" check a training
  * pipeline runs per ingest: fixed-width bins over an exact integer
  * feature, Laplace-smoothed per-source vs corpus bin shares, and
  * PSI = Σ_bins (p − q)·ln(p/q) (PSI < 0.1 stable, 0.1-0.25 moderate,
  * > 0.25 shifted — the credit-scoring convention).
  *
  * Scale design: two bounded aggregations (per-(source, bin) and
  * per-bin counts — both ≤ |sources|·bins rows after map-side combine),
  * the bin grid densified by a narrow `explode(sequence(…))` (NOT a
  * cartesian join), and the bins-sized corpus table broadcast back.
  * Nothing data-sized moves twice. Determinism: binning is integer
  * arithmetic on an exact column; p/q/terms are pure functions of
  * integer counts, so both engines compute identical doubles; per-bin
  * terms are reported individually (no order-dependent summation) and
  * the per-source total sums 10 pre-rounded terms, rounded to 4 dp.
  */
object Drift {

  /** PSI between two fixed-grid HISTOGRAM SKETCHES on the same
    * (lo, hi, nBins) grid — (bin, cnt_ref, cnt_live, p, q, term, psi):
    * per-bin Laplace-smoothed shares, each bin's drift contribution
    * (6 dp), and the grid total (4 dp, repeated per row). Both inputs
    * are ≤ nBins-row cell relations ([[Sketches.fixedBins]] directly, a
    * [[Sketches.binsMerge]] fold, or a [[Sketches.binsRead]] log fold),
    * so the monitor NEVER touches either corpus: ingest persists one
    * bounded histogram per snapshot/micro-batch, and every later
    * distribution-shift check — batch snapshot-over-snapshot or a
    * streaming gate against a frozen reference — is arithmetic over
    * 2·nBins integers. Everything here (grid densify, one-row totals,
    * the broadcast joins) is bounded by nBins by construction.
    */
  def psiFromBins(refRaw: DataFrame, liveRaw: DataFrame, nBins: Int): DataFrame = {
    require(nBins >= 2, "need nBins >= 2")
    // Defensive fold: inputs may be raw appended sink logs with several
    // rows per bin (a streaming sink that was never binsRead-folded);
    // summing here — bounded by nBins — makes any log a valid input
    // instead of silently double-counting duplicate grid-join rows.
    val ref = refRaw.groupBy("bin").agg(sum("cnt").as("cnt"))
    val live = liveRaw.groupBy("bin").agg(sum("cnt").as("cnt"))
    val spark = ref.sparkSession
    import spark.implicits._
    val grid = (0 until nBins).map(_.toLong).toDF("bin")
    val nr = ref.agg(coalesce(sum("cnt"), lit(0L)).as("n_ref"))
    val nl = live.agg(coalesce(sum("cnt"), lit(0L)).as("n_live"))
    val half = lit(0.5)
    val smooth = lit(0.5 * nBins)
    val joined = grid
      .join(broadcast(ref.withColumnRenamed("cnt", "cnt_ref")), Seq("bin"), "left")
      .join(broadcast(live.withColumnRenamed("cnt", "cnt_live")), Seq("bin"), "left")
      .withColumn("cnt_ref", coalesce(col("cnt_ref"), lit(0L)))
      .withColumn("cnt_live", coalesce(col("cnt_live"), lit(0L)))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nl))
      .withColumn("p", (col("cnt_live") + half) / (col("n_live") + smooth))
      .withColumn("q", (col("cnt_ref") + half) / (col("n_ref") + smooth))
      .withColumn("term",
        round((col("p") - col("q")) * log(col("p") / col("q")), 6))
    val total = joined.agg(round(sum("term"), 4).as("psi"))
    joined.crossJoin(broadcast(total))
      .select(col("bin"), col("cnt_ref"), col("cnt_live"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        col("term"), col("psi"))
  }

  /** Per-(source, bin) PSI report: one row per source × bin with the
    * smoothed shares, the bin's drift contribution (6 dp), and the
    * source's PSI total (4 dp). `feature` must be integral-valued.
    */
  def psiBySource(df: DataFrame, source: Column, feature: Column,
      binWidth: Long, bins: Int): DataFrame = {
    val b = df.select(source.as("source"),
      least(lit(bins - 1), floor(feature / binWidth)).cast("int").as("bin"))
    val perSB = b.groupBy("source", "bin")
      .agg(count(lit(1)).as("n_sb"))
    val perS = b.groupBy("source").agg(count(lit(1)).as("n_s"))
    val perB = b.groupBy("bin").agg(count(lit(1)).as("n_b"))
    val total = b.agg(count(lit(1)).as("n"))
    // densify: every source × every bin (explode of a literal sequence —
    // narrow, no cartesian), so empty bins still contribute smoothed mass
    val grid = perS.withColumn("bin",
      explode(sequence(lit(0), lit(bins - 1))))
    val corpus = total.withColumn("bin",
      explode(sequence(lit(0), lit(bins - 1))))
      .join(broadcast(perB), Seq("bin"), "left")
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val half = lit(0.5)
    val smooth = lit(0.5 * bins)
    val joined = grid
      .join(perSB, Seq("source", "bin"), "left")
      .withColumn("n_sb", coalesce(col("n_sb"), lit(0L)))
      .join(broadcast(corpus), Seq("bin"))
      .withColumn("p", (col("n_sb") + half) / (col("n_s") + smooth))
      .withColumn("q", (col("n_b") + half) / (col("n") + smooth))
      .withColumn("term",
        round((col("p") - col("q")) * log(col("p") / col("q")), 6))
    val totals = joined.groupBy("source")
      .agg(round(sum("term"), 4).as("psi"))
    joined.join(broadcast(totals), "source")
      .select(col("source"), col("bin"), col("n_sb"), col("n_b"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        col("term"), col("psi"))
  }
}
