package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing: assign every document a training-shard id by running
  * token count, so shard k holds the documents whose cumulative token total
  * lands in [k·budget, (k+1)·budget) — the deterministic "fill context
  * windows in corpus order" layout a pretraining data loader consumes.
  *
  * The semantics are a global running sum in id order — which naive Spark
  * expresses as a WINDOW WITH NO PARTITION, the canonical scale-killer
  * (every row through one task). This implementation is the textbook
  * two-pass distributed prefix sum instead:
  *
  *   1. range-partition by id and sort within partitions (one shuffle —
  *      the same sort any output layout needs anyway);
  *   2. per-partition token totals → driver (P scalars, not data) →
  *      exclusive prefix offsets, broadcast back;
  *   3. one narrow pass: each partition streams its sorted rows, adding
  *      its offset to a running local sum.
  *
  * Both passes run off the SAME materialized RDD object, so Spark reuses
  * the stage-1 shuffle files for pass 3 (the totals job shows up as a
  * "skipped stage") — the corpus is scanned and shuffled exactly once.
  * This is a deliberate RDD-level operator: the per-partition running sum
  * is genuine sequential per-partition logic, the one place mapPartitions
  * beats any declarative form.
  */
object Packing {

  /** (id, n_tok, bin) with bin = floor(tokens-before-this-doc / budget),
    * documents taken in ascending `id` order. `id` must be unique (it is
    * the total order); `tokens` must be non-negative.
    */
  def assignBins(df: DataFrame, id: Column, tokens: Column, budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "assignBins: budget must be positive")
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("id"), tokens.cast("long").as("n_tok"))
    val idField = base.schema.fields.head
    val sorted = base.repartitionByRange(p, col("id"))
      .sortWithinPartitions("id")
      .rdd // ONE RDD object — both jobs below share its shuffle stage
    val totals = sorted
      .mapPartitionsWithIndex { (pi, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator((pi, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bcast = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitionsWithIndex { (pi, it) =>
      var cum = bcast.value(pi)
      it.map { r =>
        val bin = cum / budget
        cum += r.getLong(1)
        Row(r.get(0), r.getLong(1), bin)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      idField.copy(name = "id"),
      StructField("n_tok", LongType, nullable = false),
      StructField("bin", LongType, nullable = false))))
  }

  /** [[assignBins]] plus the per-shard manifest a loader actually reads:
    * (bin, n_docs, n_tokens). Tiny output — one row per context-window
    * shard.
    */
  def binManifest(df: DataFrame, id: Column, tokens: Column,
      budget: Long): DataFrame =
    assignBins(df, id, tokens, budget)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))

  /** Token-budget corpus selection: take documents in descending `score`
    * order (ties → ascending id) until the cumulative token count would
    * exceed `budget` — the "best data that fits the training budget"
    * greedy cut every curation pipeline ends with. Returns the SELECTED
    * rows only, as (id, score, n_tok, cum_tok) with cum_tok the running
    * total INCLUDING the row.
    *
    * Same two-pass prefix-sum shape as [[assignBins]] (the global
    * running sum over a quality ordering is otherwise an unpartitioned
    * window — the canonical scale-killer), with the range partitioning
    * keyed on (score DESC, id) instead of id. Partitions whose exclusive
    * offset already exceeds the budget emit nothing without touching
    * their rows. `score` must be pre-rounded to a fixed dp grid if the
    * selection must reproduce across engines (the usual argmax/rank
    * discipline).
    */
  def tokenBudgetSelect(df: DataFrame, id: Column, score: Column,
      tokens: Column, budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "tokenBudgetSelect: budget must be positive")
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("id"), score.cast("double").as("score"),
      tokens.cast("long").as("n_tok"))
    val idField = base.schema.fields.head
    val sorted = base.repartitionByRange(p, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
      .rdd // ONE RDD object — the totals job reuses its shuffle stage
    val totals = sorted
      .mapPartitionsWithIndex { (pi, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(2)); Iterator((pi, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bcast = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitionsWithIndex { (pi, it) =>
      var cum = bcast.value(pi)
      if (cum > budget) Iterator.empty // already past the cut — skip rows
      else it.map { r =>
        cum += r.getLong(2)
        Row(r.get(0), r.getDouble(1), r.getLong(2), cum)
      }.takeWhile(_.getLong(3) <= budget)
    }
    spark.createDataFrame(out, StructType(Seq(
      idField.copy(name = "id"),
      StructField("score", org.apache.spark.sql.types.DoubleType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("cum_tok", LongType, nullable = false))))
  }
}
