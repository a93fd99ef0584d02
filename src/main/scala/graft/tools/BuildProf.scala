package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for the inverted-index BUILD path (guide §1:
  * measure first): times the pieces of [[graft.llm.InvertedIndex.write]]
  * in isolation against the sf dir in SPARK_GRAFT_SF_DIR — corpus scan +
  * tokenize, the postings aggregation, the parquet write, and the two
  * candidate `_terms` aggregation shapes (full-sort window vs partial-agg
  * + rank-filtered window join). Prints one line per timed piece; not
  * part of the driver surface.
  */
object BuildProf {

  /** Formatted-plan dump of the internal build jobs whose shape round 14
    * changed: the `_terms` aggregation (r13 full-sort window vs r14
    * split partial-agg + WindowGroupLimit-pruned rank join) and the
    * IVF-PQ encode relation (r13 three-relations-two-joins vs r14 one
    * projection). Both variants are expressed here verbatim as in the
    * library (the r14 shapes mirror InvertedIndex.writeTermStats /
    * IvfPq.encoded; BuildProf's timing path pins their row-equality).
    * Source of the committed plans/r14/internal_*.txt files.
    */
  private def explainInternal(spark: SparkSession, sfDir: String): Unit = {
    import graft.{Tables, TempDirs}
    val docs = Tables.documents(spark, sfDir)
    val nB = graft.QueriesQuality.PostingsBuckets
    val out = TempDirs.create("plandump_idx")
    graft.llm.InvertedIndex.write(docs, col("doc_id"), col("text"), out,
      nBuckets = nB)
    val postRows = spark.read.parquet(out)
      .select(col("bucket"), col("term"), col("tf"), col("dl"), col("doc_id"))
    val rn = row_number().over(Window.partitionBy("bucket", "term")
      .orderBy(col("tf").desc, col("dl").asc, col("doc_id")))
    println("\n========== internal: _terms aggregation (r13 shape: full-sort window) ==========")
    postRows.withColumn("_rn", rn)
      .groupBy("bucket", "term")
      .agg(count(lit(1)).cast("double").as("df"),
        max("tf").as("tf_max"), min("dl").as("dl_min"),
        sort_array(collect_list(when(col("_rn") <= 32,
          struct(col("tf"), col("dl")))), asc = false).as("tops"))
      .explain("formatted")
    println("\n========== internal: _terms aggregation (r14 shape: split agg + rank-filtered tops) ==========")
    val scalars = postRows.groupBy("bucket", "term")
      .agg(count(lit(1)).cast("double").as("df"),
        max("tf").as("tf_max"), min("dl").as("dl_min"))
    val tops = postRows.withColumn("_rn", rn).where(col("_rn") <= 32)
      .groupBy("bucket", "term")
      .agg(sort_array(collect_list(struct(col("tf"), col("dl"))),
        asc = false).as("tops"))
    scalars.join(tops, Seq("bucket", "term"))
      .withColumn("gen", lit(0L)).repartition(col("bucket"))
      .explain("formatted")
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.QueriesPipeline.kmeansCentsOf(spark, sfDir)
    val pqCents = graft.QueriesQuality.pqCentsOf(spark, sfDir)
    println("\n========== internal: IVF-PQ encode (r13 shape: three relations, two id joins) ==========")
    graft.llm.ProductQuant.encode(emb, col("vec_id"), col("embedding"), pqCents)
      .join(graft.llm.Cluster.assignWith(emb, col("vec_id"), col("embedding"),
          cents).select(col("id"), col("cluster")), "id")
      .explain("formatted")
    println("\n========== internal: IVF-PQ encode (r14 shape: one projection) ==========")
    val m = pqCents.length
    val sub = pqCents(0)(0).length
    val bcPq = spark.sparkContext.broadcast(pqCents)
    val codesU = udf { (v: Seq[Float]) =>
      Array.tabulate(m)(j =>
        graft.llm.Cluster.assign(v.slice(j * sub, (j + 1) * sub), bcPq.value(j))._1)
    }
    val clusterU = udf { (v: Seq[Float]) =>
      graft.llm.Cluster.assign(v, cents)._1 }
    emb.select(col("vec_id").as("id"), codesU(col("embedding")).as("codes"),
      clusterU(col("embedding")).as("cluster"))
      .explain("formatted")
    // round 15: the postings build's two shapes — the r14 explode +
    // (term, doc_id, dl) groupBy (one index-sized Exchange) vs the
    // per-doc tf kernel (no Exchange). Source of plans/r15/internal_
    // postings_*.txt.
    println("\n========== internal: postings build (shuffle shape: explode + groupBy) ==========")
    spark.conf.set("spark.graft.postingsShape", "shuffle")
    graft.llm.InvertedIndex.postingsRelation(docs, col("doc_id"),
      col("text"), nB).explain("formatted")
    println("\n========== internal: postings build (kernel shape: per-doc tf map) ==========")
    spark.conf.set("spark.graft.postingsShape", "kernel")
    graft.llm.InvertedIndex.postingsRelation(docs, col("doc_id"),
      col("text"), nB).explain("formatted")
    spark.conf.unset("spark.graft.postingsShape")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Tables, TempDirs}
    val docs = Tables.documents(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warmup
    noop(docs.limit(100))

    // SPARK_GRAFT_EXPLAIN_ONLY=1: print formatted plans of the internal
    // build jobs' r13 vs r14 shapes (the `_terms` aggregation and the
    // IVF-PQ encode relation) and exit — the plans/r14 evidence dump.
    if (sys.env.get("SPARK_GRAFT_EXPLAIN_ONLY").contains("1")) {
      explainInternal(spark, sfDir)
      spark.stop()
      sys.exit(0)
    }

    val toks = docs.select(col("doc_id"),
      graft.llm.TextStats.tokens(lower(col("text"))).as("t"),
      graft.llm.TextStats.tokenCount(col("text")).cast("double").as("dl"))
    time("scan_only")(noop(docs.select("doc_id")))
    time("scan_tokenize")(noop(toks))
    val exploded = toks.select(col("doc_id"), col("dl"),
      explode_outer(col("t")).as("term0"))
      .select(col("doc_id"), col("dl"),
        coalesce(col("term0"), lit("")).as("term"))
    time("tokenize_explode")(noop(exploded))
    val post = exploded.groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
    time("postings_agg")(noop(post))
    val nB = graft.QueriesQuality.PostingsBuckets
    val bucketed = post
      .withColumn("bucket", graft.llm.InvertedIndex.bucketCol(col("term"), nB))
      .withColumn("gen", lit(0L))
    time("postings_noop")(noop(
      bucketed.sortWithinPartitions(col("bucket"), col("term"), col("tf").desc)))
    val out = TempDirs.create("buildprof_idx")
    time("postings_write", 3) {
      bucketed.sortWithinPartitions(col("bucket"), col("term"), col("tf").desc)
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
    }
    println("[prof] rows=" + spark.read.parquet(out).count() +
      " terms=" + spark.read.parquet(out).select("term").distinct().count())

    // round-15 shape A/B: the postings relation under the shuffle shape
    // (explode + groupBy exchange) vs the per-doc tf kernel (no
    // exchange), noop-sunk (§1.4) and as the full partitioned write
    def shapedPostings(shape: String): DataFrame = {
      spark.conf.set("spark.graft.postingsShape", shape)
      try graft.llm.InvertedIndex.postingsRelation(docs, col("doc_id"),
        col("text"), nB)
      finally spark.conf.unset("spark.graft.postingsShape")
    }
    for (shape <- Seq("shuffle", "kernel", "shuffle", "kernel")) {
      time(s"postings_${shape}_noop")(noop(shapedPostings(shape)))
      val d = TempDirs.create(s"buildprof_$shape")
      time(s"postings_${shape}_write") {
        shapedPostings(shape)
          .write.mode("overwrite").partitionBy("bucket").parquet(d)
      }
    }

    val postRows = spark.read.parquet(out)
    // current shape: full-sort window + groupBy sharing one exchange
    def termStatsWindow(): DataFrame = {
      val rn = row_number().over(Window.partitionBy("bucket", "term")
        .orderBy(col("tf").desc, col("dl").asc, col("doc_id")))
      postRows
        .select(col("bucket"), col("term"), col("tf"), col("dl"), col("doc_id"))
        .withColumn("_rn", rn)
        .groupBy("bucket", "term")
        .agg(count(lit(1)).cast("double").as("df"),
          max("tf").as("tf_max"), min("dl").as("dl_min"),
          sort_array(collect_list(when(col("_rn") <= 32,
            struct(col("tf"), col("dl")))), asc = false).as("tops"))
    }
    // candidate shape: partial-aggregated scalar agg + rank-filtered
    // window (WindowGroupLimit prunes to <=32 rows per group before the
    // exchange), joined vocab-sized
    def termStatsSplit(): DataFrame = {
      val base = postRows
        .select(col("bucket"), col("term"), col("tf"), col("dl"), col("doc_id"))
      val scalars = base.groupBy("bucket", "term")
        .agg(count(lit(1)).cast("double").as("df"),
          max("tf").as("tf_max"), min("dl").as("dl_min"))
      val rn = row_number().over(Window.partitionBy("bucket", "term")
        .orderBy(col("tf").desc, col("dl").asc, col("doc_id")))
      val tops = base.withColumn("_rn", rn).where(col("_rn") <= 32)
        .groupBy("bucket", "term")
        .agg(sort_array(collect_list(struct(col("tf"), col("dl"))),
          asc = false).as("tops"))
      scalars.join(tops, Seq("bucket", "term"))
    }
    time("term_stats_window")(noop(termStatsWindow()))
    time("term_stats_split")(noop(termStatsSplit()))
    val t1 = TempDirs.create("buildprof_terms_w")
    time("term_stats_window_write") {
      termStatsWindow().withColumn("gen", lit(0L))
        .write.mode("overwrite").partitionBy("bucket").parquet(t1)
    }
    val t2 = TempDirs.create("buildprof_terms_s")
    time("term_stats_split_write") {
      termStatsSplit().withColumn("gen", lit(0L))
        .write.mode("overwrite").partitionBy("bucket").parquet(t2)
    }
    val t3 = TempDirs.create("buildprof_terms_sr")
    time("term_stats_split_repart") {
      termStatsSplit().withColumn("gen", lit(0L))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(t3)
    }
    val t4 = TempDirs.create("buildprof_terms_c1")
    time("term_stats_split_coal1") {
      termStatsSplit().withColumn("gen", lit(0L))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("bucket").parquet(t4)
    }
    // equality check of the two shapes
    val a = spark.read.parquet(t1).selectExpr("bucket", "term", "df",
      "tf_max", "dl_min", "tops")
    val b = spark.read.parquet(t2).selectExpr("bucket", "term", "df",
      "tf_max", "dl_min", "tops")
    println("[prof] shape_diff=" +
      (a.exceptAll(b).count() + b.exceptAll(a).count()))
    // one-row stats write: Spark job vs direct driver write
    import spark.implicits._
    time("stats_write_spark", 5) {
      Seq((1.0, 2.0, nB, 0L)).toDF("n_docs", "sum_dl", "n_buckets", "gen")
        .coalesce(1).write.mode("overwrite").parquet(out + "_stats_probe")
    }
    spark.stop()
    sys.exit(0)
  }
}
