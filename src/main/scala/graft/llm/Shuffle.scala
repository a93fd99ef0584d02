package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic corpus shuffle: assign every document a stable pseudo-
  * random training position. Pretraining loaders need the corpus in a
  * fixed shuffled order — reproducible across reruns and independent of
  * file/partition layout — which rules out both `ORDER BY rand()` (not
  * reproducible) and `monotonically_increasing_id` (layout-dependent).
  *
  * The shuffle key is md5(id) with the id itself as tie-break, so the
  * permutation is a pure function of the ids. The global 0-based rank
  * over that key is computed with the same two-pass distributed prefix
  * sum as [[Packing.assignBins]] (range-partition by key, per-partition
  * counts to the driver — P scalars — then offset + local index), NOT a
  * no-partition window: the corpus never funnels through one task, and
  * both passes share one shuffle (the totals job reuses the stage).
  */
object Shuffle {

  /** (id, shuf_pos): a deterministic permutation of 0..n-1 keyed by
    * md5(id-as-string). `id` must be unique.
    */
  def order(df: DataFrame, id: Column, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("id"),
      md5(id.cast("string").cast("binary")).as("h"))
    val idField = base.schema.fields.head
    val sorted = base.repartitionByRange(p, col("h"), col("id"))
      .sortWithinPartitions("h", "id")
      .rdd // ONE RDD object — the two jobs below share its shuffle stage
    val counts = sorted
      .mapPartitionsWithIndex { (pi, it) => Iterator((pi, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bcast = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitionsWithIndex { (pi, it) =>
      var pos = bcast.value(pi)
      it.map { r => val row = Row(r.get(0), pos); pos += 1; row }
    }
    spark.createDataFrame(out, StructType(Seq(
      idField.copy(name = "id"),
      StructField("shuf_pos", LongType, nullable = false))))
  }
}
