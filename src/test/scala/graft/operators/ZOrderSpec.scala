package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: interleave correctness on known bit patterns,
  * quantize clamping/degenerate range, and the layout property the whole
  * operator exists for — range-clustered output partitions cover
  * non-overlapping z-ranges, i.e. bounded rectangles in both dimensions.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    // (x, y) -> z for 2-bit cells: z = x0 | y0<<1 | x1<<2 | y1<<3
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (1L, 1L, 3L), (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (2L, 3L, 14L))
    val df = cases.toDF("x", "y", "want")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), bits = 2))
    assert(df.where(col("z") =!= col("want")).count() === 0)
  }

  test("interleave is monotone-compatible with locality: adjacent cells share high bits") {
    // cells in the same 2x2 block of an 8-bit grid agree on all but the
    // lowest 2 interleaved bits
    val df = Seq((10L, 20L), (11L, 20L), (10L, 21L), (11L, 21L)).toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), bits = 8))
    val hi = df.select(shiftright(col("z"), 2)).distinct().count()
    assert(hi === 1)
  }

  test("quantize clamps to the cell range and handles a degenerate range") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 105.0).toDF("v")
      .select(ZOrder.quantize(col("v"), lit(0.0), lit(100.0), bits = 2).as("c"))
    assert(df.as[Long].collect().toSeq === Seq(0L, 0L, 2L, 3L, 3L))
    val degen = Seq(1.0, 2.0).toDF("v")
      .select(ZOrder.quantize(col("v"), lit(7.0), lit(7.0), bits = 4).as("c"))
    assert(degen.as[Long].collect().toSeq === Seq(0L, 0L))
  }

  test("cluster() yields non-overlapping z-ranges across output partitions") {
    val li = graft.Tables.lineitem(spark, sf)
    val b = li.agg(min("l_extendedprice"), max("l_extendedprice"),
      min("l_quantity"), max("l_quantity")).head()
    val z = li.select(
      ZOrder.interleave(Seq(
        ZOrder.quantize(col("l_extendedprice"), lit(b.getDouble(0)), lit(b.getDouble(1)), 8),
        ZOrder.quantize(col("l_quantity"), lit(b.getDouble(2)), lit(b.getDouble(3)), 8)), 8).as("zkey"))
    val parts = ZOrder.cluster(z, col("zkey"), numFiles = 8)
      .select(col("zkey"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("zkey").as("lo"), max("zkey").as("hi"), count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Long]("lo"))
    assert(parts.map(_.getAs[Long]("n")).sum === li.count())
    parts.sliding(2).foreach {
      case Array(a, bb) => assert(a.getAs[Long]("hi") <= bb.getAs[Long]("lo"),
        s"overlapping z-ranges: $a vs $bb")
      case _ =>
    }
    // the point of the layout: each range-partition covers a bounded
    // rectangle, so per-file footer stats prune BOTH dimensions. With 8
    // files over a 256x256 grid, every file's rectangle must be far
    // smaller than the full grid in at least one dimension.
    val rects = ZOrder.cluster(z, col("zkey"), numFiles = 8)
      .select(col("zkey"), spark_partition_id().as("pid"))
      .withColumn("qx", ZOrderSpec.deinterleaveX(col("zkey")))
      .withColumn("qy", ZOrderSpec.deinterleaveY(col("zkey")))
      .groupBy("pid")
      .agg((max("qx") - min("qx")).as("wx"), (max("qy") - min("qy")).as("wy"))
      .collect()
    // a contiguous z-range tiles the grid: the summed rectangle area stays
    // O(grid), where an unclustered 8-way split would cover the full
    // 256x256 grid per file (sum = 8 * 65536). 2x grid = generous slack
    // for range-boundary blocks.
    val sumArea = rects.map(r =>
      (r.getAs[Long]("wx") + 1) * (r.getAs[Long]("wy") + 1)).sum
    assert(sumArea <= 2L * 256 * 256, s"z-ranges not localized: sumArea=$sumArea")
  }

  test("zRanges covers exactly the rectangle's codes when uncapped") {
    // brute-force ground truth on a 16x16 grid
    val (lx, hx, ly, hy) = (3L, 11L, 5L, 13L)
    val want = (for {
      x <- lx to hx
      y <- ly to hy
    } yield ZOrderSpec.mortonRef(x, y, 4)).toSet
    val got = ZOrder.zRanges(lx, hx, ly, hy, bits = 4, maxRanges = Int.MaxValue)
      .flatMap { case (lo, hi) => lo to hi }.toSet
    assert(got === want)
  }

  test("zRangesN covers exactly a 3-D box's codes when uncapped") {
    // brute-force ground truth on an 8x8x8 grid (bits=3, n=3)
    val (lo, hi) = (Seq(1L, 2L, 0L), Seq(5L, 7L, 4L))
    val want = (for {
      x <- lo(0) to hi(0)
      y <- lo(1) to hi(1)
      z <- lo(2) to hi(2)
    } yield ZOrderSpec.mortonRefN(Seq(x, y, z), 3)).toSet
    val got = ZOrder.zRangesN(lo, hi, bits = 3, maxRanges = Int.MaxValue)
      .flatMap { case (rlo, rhi) => rlo to rhi }.toSet
    assert(got === want)
  }

  test("zRangesN 3-D capped intervals are a superset merged to the cap") {
    val exact = ZOrder.zRangesN(Seq(1L, 2L, 0L), Seq(5L, 7L, 4L), 3, Int.MaxValue)
    val capped = ZOrder.zRangesN(Seq(1L, 2L, 0L), Seq(5L, 7L, 4L), 3, maxRanges = 4)
    assert(capped.size <= 4 && capped.size < exact.size)
    val exactSet = exact.flatMap { case (l, h) => l to h }.toSet
    val cappedSet = capped.flatMap { case (l, h) => l to h }.toSet
    assert(exactSet.subsetOf(cappedSet))
  }

  test("interleave codes agree with the n-dim scalar reference in 3-D") {
    val cases = Seq(Seq(0L, 0L, 0L), Seq(1L, 0L, 0L), Seq(0L, 1L, 0L),
      Seq(0L, 0L, 1L), Seq(3L, 5L, 6L), Seq(7L, 7L, 7L))
    val df = cases.map(c => (c(0), c(1), c(2),
        ZOrderSpec.mortonRefN(c, 3))).toDF("x", "y", "z", "want")
      .withColumn("got",
        ZOrder.interleave(Seq(col("x"), col("y"), col("z")), bits = 3))
    assert(df.where(col("got") =!= col("want")).count() === 0)
  }

  test("empty or inverted rectangles yield no intervals and a false filter") {
    assert(ZOrder.zRanges(10, 5, 0, 3, bits = 4).isEmpty)
    // a rectangle past the grid edge intersects nothing
    assert(ZOrder.zRangesN(Seq(20L, 0L), Seq(30L, 3L), bits = 4).isEmpty)
    val df = Seq(1L, 2L).toDF("zkey")
      .where(ZOrder.zRangeFilter(col("zkey"), Seq.empty))
    assert(df.count() === 0)
  }

  test("capped zRanges are a superset, merged to the cap") {
    val exact = ZOrder.zRanges(3, 11, 5, 13, 4, maxRanges = Int.MaxValue)
    val capped = ZOrder.zRanges(3, 11, 5, 13, 4, maxRanges = 4)
    assert(capped.size <= 4 && capped.size < exact.size)
    val exactSet = exact.flatMap { case (lo, hi) => lo to hi }.toSet
    val cappedSet = capped.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(exactSet.subsetOf(cappedSet))
  }

  test("z-range filter on the clustered layout skips files") {
    val li = graft.Tables.lineitem(spark, sf)
    val b = li.agg(min("l_extendedprice"), max("l_extendedprice"),
      min("l_quantity"), max("l_quantity")).head()
    val keyed = li.select(
      ZOrder.quantize(col("l_extendedprice"), lit(b.getDouble(0)), lit(b.getDouble(1)), 8).as("qx"),
      ZOrder.quantize(col("l_quantity"), lit(b.getDouble(2)), lit(b.getDouble(3)), 8).as("qy"))
      .withColumn("zkey", ZOrder.interleave(Seq(col("qx"), col("qy")), 8))
    val out = java.nio.file.Files.createTempDirectory("zorder_prune").toString
    ZOrder.cluster(keyed, col("zkey"), numFiles = 8)
      .write.mode("overwrite").parquet(out)
    // a small rectangle: its z-intervals intersect few of the 8 files'
    // [min,max] zkey spans — that intersection count IS what parquet
    // footer pruning skips by
    val ranges = ZOrder.zRanges(0, 63, 0, 63, 8)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .collect()
    assert(spans.length === 8)
    val touched = spans.count(r => ranges.exists { case (rlo, rhi) =>
      rlo <= r.getAs[Long]("hi") && rhi >= r.getAs[Long]("lo")
    })
    assert(touched < spans.length,
      s"rectangle touching all $touched/${spans.length} files: no pruning")
    // and the filtered read returns exactly the rectangle's rows
    val viaRanges = spark.read.parquet(out)
      .where(ZOrder.zRangeFilter(col("zkey"), ranges) &&
        col("qx").between(0, 63) && col("qy").between(0, 63)).count()
    val direct = keyed
      .where(col("qx").between(0, 63) && col("qy").between(0, 63)).count()
    assert(viaRanges === direct)
  }
}

object ZOrderSpec {
  import org.apache.spark.sql.Column

  /** Scalar reference interleave for ground-truth sets in the zRanges
    * tests (independent of the Column implementation under test).
    */
  def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
  /** n-dim scalar reference: bit i of dim d lands at i*n + d. */
  def mortonRefN(cells: Seq[Long], bits: Int): Long = {
    val n = cells.size
    (for { i <- 0 until bits; d <- 0 until n }
      yield ((cells(d) >> i) & 1L) << (i * n + d)).foldLeft(0L)(_ | _)
  }
  /** Even (x) / odd (y) bit extraction — the inverse of a 2-column
    * 8-bit interleave, for asserting rectangle bounds.
    */
  def deinterleaveX(z: Column): Column =
    (0 until 8).map(i => shiftleft(shiftright(z, 2 * i).bitwiseAND(lit(1L)), i))
      .reduce(_.bitwiseOR(_))
  def deinterleaveY(z: Column): Column =
    (0 until 8).map(i => shiftleft(shiftright(z, 2 * i + 1).bitwiseAND(lit(1L)), i))
      .reduce(_.bitwiseOR(_))
}
