package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * The 100-TB fact-to-fact join problem: two data-sized tables joined on a
  * shared key shuffle BOTH sides every query. Writing each side bucketed
  * (hash-partitioned into the same bucket count, sorted within buckets) on
  * the join key moves that shuffle to write time, once: every later
  * sort-merge join between them matches buckets pairwise with ZERO
  * exchange — and the per-bucket sort makes it merge-only, no sort either.
  * This is the persisted-layout counterpart of
  * [[graft.operators.SkewJoin]]'s runtime salting and
  * [[ZOrder.cluster]]'s scan-pruning layout.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table under `path` and
    * return it re-read through the catalog (bucket metadata only lives on
    * catalog tables — a plain parquet read of the same files would not
    * know the layout and would shuffle anyway).
    *
    * The pre-write `repartition(buckets, key)` uses the SAME Murmur3 hash
    * partitioning as the bucket spec, so each write task holds exactly one
    * bucket → ONE file per bucket instead of tasks×buckets small files.
    * That shuffle is the layout's entire point (paid once at write time),
    * and single-file buckets are what lets the reader trust the per-bucket
    * sort (`sortBy`) and plan merge-only joins with no SortExec either.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      path: String, key: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    // backtick-quoted identifier: the caller-supplied name can't smuggle
    // SQL, and names with metacharacters fail loudly instead of weirdly
    spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(table)}")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** As [[writeBucketed]], but with a collision-free table name derived
    * from the (unique) output path. The token is the first 16 hex chars
    * (64 bits) of the path's MD5 — negligible collision odds, unlike a
    * 32-bit hash — so concurrent sessions sharing a metastore can't
    * collide on a fixed NAME (that is the full extent of the cross-JVM
    * protection; generation cleanup below is per-JVM only). Catalog
    * accumulation across repeated invocations in one JVM is bounded:
    * each call best-effort drops this JVM's older generations of the
    * same prefix, keeping up to three live (the cleanup runs before the
    * current table is enqueued, so the two most recent PLUS the one
    * being written survive — a just-registered concurrent writer with
    * the same prefix is never clobbered).
    */
  def writeBucketedAuto(spark: SparkSession, df: DataFrame, prefix: String,
      path: String, key: String, buckets: Int): DataFrame = {
    val token = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val table = s"${prefix}_$token"
    val gen = generations.computeIfAbsent(prefix,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
    while (gen.size > 2) {
      val old = gen.poll()
      if (old != null && old != table)
        try spark.sql(s"DROP TABLE IF EXISTS ${quoteIdent(old)}")
        catch { case scala.util.control.NonFatal(_) => }
    }
    val out = writeBucketed(spark, df, table, path, key, buckets)
    gen.add(table)
    out
  }

  private val generations =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[String]]()

  /** Backtick-quoted identifier (embedded backticks doubled, per Spark's
    * identifier escaping).
    */
  private[graft] def quoteIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
