package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * The 100-TB problem: parquet min/max footer stats prune on the SORT
  * column only — a layout sorted by `price` answers price ranges fast but
  * scans everything for a `quantity` predicate. Interleaving the bits of
  * several quantized dimensions into one sort key gives every file a small
  * hyper-rectangle in ALL of them, so footer stats prune multi-dimensional
  * predicates (the Delta/Iceberg `ZORDER BY` layout, here as a plain
  * column + one range shuffle).
  *
  * Everything is arithmetic on longs (shift/and/or of the quantized
  * cells), codegen'd inside the write projection — no UDF, no extra pass:
  * quantization bounds come from the writer's existing stats pass (or any
  * approximation; wrong bounds degrade pruning, never correctness, because
  * [[quantize]] clamps).
  */
object ZOrder {

  /** `v` quantized to a `bits`-wide non-negative cell index within
    * [lo, hi]: `floor((v-lo)/(hi-lo) * 2^bits)` clamped to
    * [0, 2^bits - 1]. Degenerate range (hi <= lo) → cell 0. Pure IEEE
    * double arithmetic, so any engine computing the same formula lands on
    * the identical cell.
    */
  def quantize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = 1L << bits
    val raw = floor((v.cast("double") - lo) / (hi - lo) * cells).cast("long")
    when(hi <= lo, lit(0L))
      .otherwise(least(lit(cells - 1), greatest(lit(0L), raw)))
  }

  /** Morton interleave of `bits`-wide non-negative cell columns: bit `i`
    * of column `c` lands at position `i * n + c` (column 0 owns the least
    * significant lane). Total key width `bits * n` must fit a long.
    * Unrolled shift/and/shift terms — one flat codegen expression.
    */
  def interleave(cells: Seq[Column], bits: Int): Column = {
    val n = cells.size
    require(n >= 1 && bits * n <= 63, s"zorder key width ${bits * n} > 63")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The layout operator: range-partition on the z-key into `numFiles`
    * output tasks and sort within each, so every written file covers one
    * contiguous z-range — i.e. a bounded rectangle in every interleaved
    * dimension, which is what makes its footer stats prune. ONE shuffle
    * (range exchange with sampled bounds), the same cost as any
    * write-time sort, amortized over every future multi-dim scan.
    */
  def cluster(df: DataFrame, zkey: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, zkey).sortWithinPartitions(zkey)
}
