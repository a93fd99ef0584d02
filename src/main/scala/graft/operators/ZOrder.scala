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

  /** The query-side half of the layout, for any dimension count n:
    * decompose the cell hyper-rectangle ∏[lo(d)..hi(d)] into contiguous
    * z-key intervals via a 2ⁿ-tree walk (a subcube fully inside the
    * rectangle emits its whole z-block; a straddling subcube recurses),
    * then greedily re-merge the smallest inter-interval gaps until at
    * most `maxRanges` remain. Coarsened intervals are a SUPERSET of the
    * rectangle's z-codes, so callers keep the exact per-dimension
    * predicate for correctness and use these only to prune
    * ([[zRangeFilter]]) — the standard z-order read pattern: sorted-file
    * footer stats skip everything outside the intervals, the residual
    * predicate trims the rest.
    *
    * A cube of side 2h splits into 2ⁿ subcubes of hⁿ consecutive z-codes
    * each, ordered by the interleave of the subcubes' top bits — i.e.
    * child m (bit d of m = upper half in dimension d, dimension 0 owning
    * the least significant lane, matching [[interleave]]) starts at
    * zbase + m·hⁿ. Driver-side arithmetic only; nothing here touches
    * data. An empty or inverted rectangle yields an empty Seq.
    */
  def zRangesN(lo: Seq[Long], hi: Seq[Long], bits: Int,
      maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(maxRanges >= 1)
    val n = lo.size
    // n <= 30 keeps the 2^n child fan-out inside Int (1 << 31 would go
    // negative and silently emit zero intervals); real layouts cluster
    // on a handful of dimensions anyway. Key width stops at 62 (one bit
    // below interleave's 63): a full-cover rectangle emits an interval of
    // 2^(bits·n) codes, and at 63 that block size — plus the gap-merge's
    // `last + 1` at Long.MaxValue — overflows Long
    require(hi.size == n && n >= 1 && n <= 30 && bits * n <= 62,
      s"zRangesN: ${hi.size} his for $n los, key width ${bits * n}")
    def pow(h: Long): Long = { var v = 1L; var d = 0; while (d < n) { v *= h; d += 1 }; v }
    def walk(origin: Seq[Long], size: Long, zbase: Long): Vector[(Long, Long)] =
      if (origin.indices.exists(d =>
            origin(d) > hi(d) || origin(d) + size - 1 < lo(d)))
        Vector.empty
      else if (origin.indices.forall(d =>
            origin(d) >= lo(d) && origin(d) + size - 1 <= hi(d)))
        Vector((zbase, zbase + pow(size) - 1))
      else {
        val h = size / 2
        val block = pow(h)
        (0 until (1 << n)).toVector.flatMap { m =>
          val childOrigin = origin.indices.map(d =>
            origin(d) + (if (((m >> d) & 1) == 1) h else 0L))
          walk(childOrigin, h, zbase + m.toLong * block)
        }
      }
    val exact = walk(Seq.fill(n)(0L), 1L << bits, 0L).sortBy(_._1)
      .foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, (rlo, rhi)) if acc.nonEmpty && acc.last._2 + 1 == rlo =>
          acc.init :+ (acc.last._1 -> rhi)
        case (acc, r) => acc :+ r
      }
    var ranges = exact
    while (ranges.size > maxRanges) {
      // merge across the smallest gap: grows the superset least
      val i = (1 until ranges.size)
        .minBy(j => ranges(j)._1 - ranges(j - 1)._2)
      ranges = (ranges.take(i - 1) :+ (ranges(i - 1)._1 -> ranges(i)._2)) ++
        ranges.drop(i + 1)
    }
    ranges
  }

  /** 2-D convenience wrapper over [[zRangesN]] (x = dimension 0). */
  def zRanges(loX: Long, hiX: Long, loY: Long, hiY: Long, bits: Int,
      maxRanges: Int = 32): Seq[(Long, Long)] =
    zRangesN(Seq(loX, loY), Seq(hiX, hiY), bits, maxRanges)

  /** OR-of-BETWEENs over the decomposed intervals — a pushable predicate
    * on the sorted z-key column, so parquet footer stats skip files/row
    * groups outside every interval. No intervals (rectangle misses the
    * grid entirely) → a constant-false predicate, not a throw.
    */
  def zRangeFilter(zkey: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => zkey.between(lo, hi) }
      .reduceOption(_ || _).getOrElse(lit(false))
}
