package graft.tools

/** Shared latency-sampling discipline for the standalone bench tools
  * (LongPostBench, IvfSizing): wall-clock a plan's full execution,
  * discard steal-contaminated reps within a recorded budget (the
  * Bench.scala policy, minimal form), and read percentiles off the
  * sorted samples.
  *
  * The discard budget is TIME-based and scales with the reps actually
  * measured (VERDICT r13 item 4: a fixed 40-discard count exhausted
  * three rounds running at sf10, where reps run ~10× longer and each
  * one spends ~10× more wall exposed to the host's steal waves —
  * discards then silently kept contaminated reps): a discard is allowed
  * while the cumulative discarded wall stays under `discardFrac` of the
  * cumulative KEPT wall (floored so the first long rep is retryable).
  * Spend and final budget are public so artifacts can stamp them.
  */
private[tools] final class LatSampling(
    discardFrac: Double =
      sys.env.getOrElse("SPARK_GRAFT_LAT_DISCARD_FRAC", "1.0").toDouble,
    floorMs: Double = 10000.0) {
  var retries = 0
  var discardMs = 0.0
  private var keptMs = 0.0

  /** The current discard allowance (grows with measured work). */
  def budgetMs: Double = math.max(floorMs, discardFrac * keptMs)

  private def stealJiffies(): Long =
    try {
      val f = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0).trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    } catch { case _: Throwable => 0L }

  /** One sample of `f` (ms), re-run while steal exceeds 15% of wall. */
  def sampled(f: => Double): Double = {
    var out = Double.NaN
    while (out.isNaN) {
      val s0 = stealJiffies()
      val v = f
      val st = (stealJiffies() - s0) * 10
      if (st > 50 && st > 0.15 * v && discardMs + v <= budgetMs) {
        retries += 1
        discardMs += v
      } else {
        out = v
        keptMs += v
      }
    }
    out
  }

  /** Execute the full physical plan without collecting; wall ms. */
  def runMs(df: => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreach(_ => ())
    (System.nanoTime() - t0) / 1e6
  }

  def pct(sorted: IndexedSeq[Double], p: Double): Double =
    sorted(math.min(sorted.size - 1, (p * (sorted.size - 1)).round.toInt))
}
