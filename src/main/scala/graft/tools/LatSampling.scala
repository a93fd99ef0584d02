package graft.tools

/** Shared latency-sampling discipline for the standalone bench tools
  * (LongPostBench, IvfSizing): wall-clock a plan's full execution,
  * discard steal-contaminated reps within a recorded budget (the
  * Bench.scala policy, minimal form), and read percentiles off the
  * sorted samples.
  */
private[tools] final class LatSampling(maxRetries: Int = 40) {
  var retries = 0

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
      if (st > 50 && st > 0.15 * v && retries < maxRetries) retries += 1
      else out = v
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
