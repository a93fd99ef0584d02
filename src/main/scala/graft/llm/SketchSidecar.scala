package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-pass-per-snapshot persistence of the whole portable sketch family
  * BESIDE a corpus — the artifact [[Sketches]]' header promises: ingest
  * scans the snapshot once (cached across the five bounded aggregations)
  * and leaves summaries that every later stage — another engine
  * included — probes without rescanning the data. Layout under `path/`:
  *
  *   - `kmv/`   (grp, h)            — k smallest content hashes per group
  *   - `hll/`   (grp, reg, mx)      — HyperLogLog registers per group
  *   - `cms/`   (seed, bucket, total) — Count-Min cells over an item stream
  *   - `bloom/` (pos)               — Bloom bit positions over a key
  *   - `bins/`  (bin, cnt)          — fixed-grid histogram of a numeric col
  *   - `_meta/` one row: every sketch parameter + provenance stamps
  *
  * The readers are the existing log folds ([[Sketches.kmvRead]],
  * [[Sketches.hllRead]], [[Sketches.cmsRead]], [[Sketches.bloomRead]],
  * [[Sketches.binsRead]] pointed at the subdirectories): a sidecar is a
  * valid ONE-ELEMENT log, so batch sidecars and streaming sink logs
  * ([[graft.streaming.DocStream]]) are interchangeable at read time, and
  * two snapshots' sidecars feed the drift reports
  * ([[Sketches.kmvJaccardAcross]], [[Drift.psiFromBins]]) directly.
  *
  * Scale shape: one cached corpus scan; each write is a bounded relation
  * (≤ k·groups, ≤ 2^p·groups, ≤ depth×width, ≤ bits, ≤ nBins rows) so
  * the sidecar's size is independent of corpus size.
  */
object SketchSidecar {

  /** Which column feeds each sketch, plus the family parameters.
    * `grp`/`content` feed KMV and HLL (distinct-content cardinality and
    * overlap per group); `items` is an ARRAY column (tokens, bigrams —
    * wrap a scalar in `array(...)`) exploded here to feed the CMS
    * frequency cells; `key` feeds the Bloom gate; `value` feeds the
    * histogram over [lo, hi)×nBins.
    */
  final case class Conf(
      grp: Column, content: Column, items: Column, key: Column, value: Column,
      lo: Double, hi: Double, nBins: Int = 64,
      kmvK: Int = 256, hllP: Int = 8,
      cmsDepth: Int = 4, cmsWidth: Int = 256,
      bloomHashes: Int = 6, bloomBits: Int = 2048)

  def kmvPath(path: String) = s"$path/kmv"
  def hllPath(path: String) = s"$path/hll"
  def cmsPath(path: String) = s"$path/cms"
  def bloomPath(path: String) = s"$path/bloom"
  def binsPath(path: String) = s"$path/bins"

  /** Write the five sketches plus `_meta` under `path` (overwrite).
    * The whole family is STAGED into a sibling temp directory and
    * swapped into place with a single directory rename, so a reader
    * never observes a torn sidecar (a failure mid-way through six
    * independent subdirectory overwrites would otherwise leave a mixed
    * old/new layout whose stale `_meta` looks consistent). The swap is
    * delete-then-rename, same as [[graft.llm.InvertedIndex.compact]]:
    * there is a brief window with no sidecar at `path`, and if the
    * rename itself fails inside it the STAGED directory is deliberately
    * left on disk as the only surviving copy (the error names it) — the
    * cleanup below removes the staging dir only when the target is
    * known intact (rename succeeded, or the failure happened before the
    * old sidecar was deleted). The input is persisted for the duration
    * so the corpus is read from storage once, not five times.
    */
  def write(df: DataFrame, path: String, conf: Conf): Unit = {
    val spark = df.sparkSession
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".staging-" + java.util.UUID.randomUUID().toString.take(8))
    val cached = df.persist()
    var targetDeleted = false
    var renamed = false
    try {
      val t = tmp.toString
      Sketches.kmvHashes(cached, conf.grp, conf.content, conf.kmvK)
        .write.mode("overwrite").parquet(kmvPath(t))
      Sketches.hllRegisters(cached, conf.grp, conf.content, conf.hllP)
        .write.mode("overwrite").parquet(hllPath(t))
      Sketches.cmsCells(cached.select(explode(conf.items).as("_item")),
          col("_item"), conf.cmsDepth, conf.cmsWidth)
        .write.mode("overwrite").parquet(cmsPath(t))
      Sketches.bloomBits(cached, conf.key, conf.bloomHashes, conf.bloomBits)
        .write.mode("overwrite").parquet(bloomPath(t))
      Sketches.fixedBins(cached, conf.value, conf.lo, conf.hi, conf.nBins)
        .write.mode("overwrite").parquet(binsPath(t))
      writeMeta(spark, t, conf)
      if (fs.exists(target) && !fs.delete(target, true))
        sys.error(s"SketchSidecar: could not remove previous sidecar at $path")
      targetDeleted = true
      if (!fs.rename(tmp, target))
        sys.error(s"SketchSidecar: rename $tmp -> $path failed — " +
          s"the staged copy survives at $tmp")
      renamed = true
    } finally {
      cached.unpersist()
      // delete staging only when the data is safe elsewhere: after a
      // successful rename (tmp may linger on object stores that copy),
      // or on a failure that happened while the OLD sidecar still
      // existed. A rename failure after the target delete leaves tmp as
      // the ONLY copy — keep it for recovery.
      if ((renamed || !targetDeleted) && fs.exists(tmp)) { fs.delete(tmp, true); () }
    }
  }

  private def writeMeta(spark: SparkSession, path: String, conf: Conf): Unit = {
    import spark.implicits._
    Seq((conf.kmvK, conf.hllP, conf.cmsDepth, conf.cmsWidth,
        conf.bloomHashes, conf.bloomBits, conf.lo, conf.hi, conf.nBins,
        graft.tools.Provenance.commit, graft.tools.Provenance.generatedAtUtc))
      .toDF("kmv_k", "hll_p", "cms_depth", "cms_width",
        "bloom_hashes", "bloom_bits", "lo", "hi", "n_bins",
        "_commit", "_generated_at_utc")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The `_meta` row — sketch parameters and provenance — so a reader
    * can fold a sidecar without out-of-band knowledge of k/p/grid.
    */
  def readMeta(spark: SparkSession, path: String): org.apache.spark.sql.Row =
    spark.read.parquet(s"$path/_meta").head()
}
