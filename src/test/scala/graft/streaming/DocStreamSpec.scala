package graft.streaming

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object DocStreamSpec {
  /** One sketch-stream item (top-level so spark.implicits can derive an
    * Encoder — local case classes have no stable TypeTag).
    */
  final case class Item(item: String)
}

class DocStreamSpec extends SparkSpec {
  import DocStreamSpec.Item

  /** Poll `cond` (5/s) until true or `ms` elapse — the stateful
    * AvailableNow queries in this suite never terminate on their own
    * (TTL timers hold them), so tests wait on observable results, never
    * on query lifecycle. Times out silently: the caller's assertion
    * then reports the actual observed state.
    */
  private def awaitUntil(ms: Long)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(200)
  }

  private def corpus(n: Int): Seq[DocStream.Doc] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(n)
      .collect()
      .map(r => DocStream.Doc(r.getLong(0), r.getString(1)))
    // plant near-dups: same text + a short tail, ids offset by 1e6
    docs.toSeq ++ docs.map(d =>
      DocStream.Doc(d.doc_id + 1000000L, d.text + " near duplicate tail"))
  }

  test("streaming CMS cell sink: folded log equals the batch sketch; replay is a no-op") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Sketches
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("item"))
      .where(length(col("item")) > 0)
      .collect().map(r => Item(r.getString(0))).toSeq
    val (w1, w2) = all.splitAt(all.size / 2)
    val path = java.nio.file.Files.createTempDirectory("cms_log").toString

    val mem = MemoryStream[Item]
    mem.addData(w1)
    val sink = DocStream.cmsCellsSink(path, "item", depth = 3, width = 64)
    val q = mem.toDF().writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    sink(w2.toDF(), 1000L) // second wave, distinct batch id

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) -> r.getAs[Long]("total")
    val folded = Sketches.cmsRead(spark, path).collect().map(key).toMap
    val batch = Sketches.cmsCells(all.toDF(), col("item"), 3, 64)
      .collect().map(key).toMap
    assert(folded === batch, "log-structured fold diverged from the batch sketch")

    sink(w2.toDF(), 1000L) // replayed batch: _applied marker must gate it
    assert(Sketches.cmsRead(spark, path).collect().map(key).toMap === batch,
      "replayed batch double-counted")
  }

  test("streaming Bloom bit sink: folded log equals the batch bit set") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Sketches
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 400).map(i => Item(s"url$i"))
    val (w1, w2) = keys.splitAt(200)
    val path = java.nio.file.Files.createTempDirectory("bloom_log").toString

    val mem = MemoryStream[Item]
    mem.addData(w1)
    val sink = DocStream.bloomBitsSink(path, "item", hashes = 5, bits = 4096)
    val q = mem.toDF().writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    sink(w2.toDF(), 1000L)

    val folded = Sketches.bloomRead(spark, path)
      .collect().map(_.getAs[Long]("pos")).toSet
    val batch = Sketches.bloomBits(keys.toDF(), col("item"), 5, 4096)
      .collect().map(_.getAs[Long]("pos")).toSet
    assert(folded === batch)
    // a streamed-in key must be a hit against the folded bits
    val hit = Sketches.bloomProbe(Seq(Item("url1")).toDF(), col("item"),
      Sketches.bloomRead(spark, path), 5, 4096)
      .collect().head.getAs[Boolean]("bloom_hit")
    assert(hit, "seen key missed against the folded filter")
  }

  test("streaming KMV hash sink: folded log matches the batch estimate") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Sketches
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(200)
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq
    val (w1, w2) = docs.splitAt(100)
    val path = java.nio.file.Files.createTempDirectory("kmv_log").toString
    // 3 groups of ~66 ids each with k=32: the saturated estimation branch
    def grouped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("g", pmod(col("doc_id"), lit(3)).cast("string"))

    val mem = MemoryStream[DocStream.Doc]
    mem.addData(w1)
    val sink = DocStream.kmvHashesSink(path, "g", "doc_id", k = 32)
    val q = grouped(mem.toDF()).writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    sink(grouped(w2.toDF()), 1000L)

    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val folded = toMap(Sketches.kmvRead(spark, path, 32))
    val batch = toMap(Sketches.kmvDistinct(grouped(docs.toDF()), col("g"), col("doc_id"), 32))
    assert(folded === batch, "folded KMV log diverged from the batch sketch")
  }

  test("streaming HLL register sink: folded log matches the batch estimate") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Sketches
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(200)
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq
    val (w1, w2) = docs.splitAt(100)
    val path = java.nio.file.Files.createTempDirectory("hll_log").toString
    def grouped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("g", pmod(col("doc_id"), lit(2)).cast("string"))

    val mem = MemoryStream[DocStream.Doc]
    mem.addData(w1)
    val sink = DocStream.hllRegistersSink(path, "g", "doc_id", p = 8)
    val q = grouped(mem.toDF()).writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    sink(grouped(w2.toDF()), 1000L)
    // replay the second batch: the _applied guard plus max-fold both make it a no-op
    sink(grouped(w2.toDF()), 1000L)

    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val folded = toMap(Sketches.hllRead(spark, path, 8))
    val batch = toMap(Sketches.hllDistinct(grouped(docs.toDF()), col("g"), col("doc_id"), 8))
    assert(folded === batch, "folded HLL register log diverged from the batch sketch")
  }

  test("streaming fixed-bin histogram sink: folded log serves the batch quantiles") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Sketches
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(200)
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq
    val (w1, w2) = docs.splitAt(100)
    val path = java.nio.file.Files.createTempDirectory("bins_log").toString
    val (lo, hi, nBins) = (0.0, 4000.0, 40)
    def withLen(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("len", length(col("text")).cast("double"))

    val mem = MemoryStream[DocStream.Doc]
    mem.addData(w1)
    val sink = DocStream.fixedBinsSink(path, "len", lo, hi, nBins)
    val q = withLen(mem.toDF()).writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    sink(withLen(w2.toDF()), 1000L)
    // replayed batch: the _applied guard makes it a no-op (sums would drift)
    sink(withLen(w2.toDF()), 1000L)

    def qmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val qs = Seq(0.5, 0.9)
    val folded = qmap(Sketches.quantilesFromBins(
      Sketches.binsRead(spark, path), lo, hi, nBins, qs))
    val batch = qmap(Sketches.quantilesFromBins(
      Sketches.fixedBins(withLen(docs.toDF()), col("len"), lo, hi, nBins),
      lo, hi, nBins, qs))
    assert(folded === batch, "folded histogram log diverged from the batch histogram")
  }

  test("streaming drift gate: live histogram fold trips PSI against a frozen reference") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.{Drift, Sketches}
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, nBins) = (0.0, 1500.0, 30)
    // frozen reference histogram: text lengths uniform over 400..599
    // (a whole number of 200-cycles, so ref and live share the shape)
    val refBins = Sketches.fixedBins(
      (1 to 400).map(i => 400.0 + i % 200).toDF("len"), col("len"), lo, hi, nBins)
    def run(mkLen: Int => Int): Double = {
      val docs = (1 to 200).map(i => DocStream.Doc(i.toLong, "x" * mkLen(i)))
      val path = java.nio.file.Files.createTempDirectory("drift_log").toString
      val mem = MemoryStream[DocStream.Doc]
      mem.addData(docs)
      val sink = DocStream.fixedBinsSink(path, "len", lo, hi, nBins)
      val q = mem.toDF().withColumn("len", length(col("text")).cast("double"))
        .writeStream.foreachBatch(sink).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      Drift.psiFromBins(refBins, Sketches.binsRead(spark, path), nBins)
        .collect().head.getAs[Double]("psi")
    }
    val same = run(i => 400 + i % 200)    // in-distribution stream
    val shifted = run(i => 800 + i % 200) // +400 shift
    assert(same < 0.05, s"in-distribution stream scored PSI $same")
    assert(shifted > 0.25, s"shifted stream scored PSI $shifted, below the alert line")
  }

  test("streaming quality gate matches the batch filter") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(100)
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq

    val batchKept = DocStream.qualityGate(docs.toDF(), 0.86)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < docs.size,
      "threshold must bind for the test to mean anything")

    val mem = MemoryStream[DocStream.Doc]
    mem.addData(docs)
    val q = DocStream.qualityGate(mem.toDF(), 0.86)
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("qgate_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("qgate_out").collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept,
      s"stream/batch mismatch: missing=${batchKept.diff(streamed).take(3)} extra=${streamed.diff(batchKept).take(3)}")
  }

  test("streaming gopher gate matches the batch filter") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(100)
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq

    val batchKept = DocStream.gopherGate(docs.toDF())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < docs.size,
      "gopher rules must bind for the test to mean anything")

    val mem = MemoryStream[DocStream.Doc]
    mem.addData(docs)
    val q = DocStream.gopherGate(mem.toDF())
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_gate_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("gopher_gate_out").collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept,
      s"stream/batch mismatch: missing=${batchKept.diff(streamed).take(3)} extra=${streamed.diff(batchKept).take(3)}")
  }

  test("streaming near-dup flags match the batch run of the same operator") {
    implicit val s = spark
    import s.implicits._
    val data = corpus(100)

    val batchFlags = DocStream.nearDupFlags(data.toDS())
      .collect().map(f => (f.doc_id, f.dup_of)).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocStream.Doc]
    mem.addData(data)
    val q = DocStream.nearDupFlags(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dupflags_out")
      .trigger(Trigger.AvailableNow())
      .start()
    val streamed =
      try {
        // poll the SINK for the expected result instead of waiting on
        // query lifecycle: the ProcessingTimeTimeout state operator
        // holds the AvailableNow query alive for its (long) TTL timers,
        // so awaitTermination burned its full 180 s timeout (~3 min of
        // pure suite wait) and processAllAvailable never gets its
        // no-new-data signal at all
        def read() = spark.table("dupflags_out")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        awaitUntil(120000)(read() == batchFlags)
        read()
      } finally q.stop() // never leave a zombie query competing for cores

    assert(streamed.nonEmpty, "streaming emitted no flags")
    assert(streamed == batchFlags,
      s"stream/batch mismatch: missing=${batchFlags.diff(streamed).take(3)} extra=${streamed.diff(batchFlags).take(3)}")
  }

  test("planted near-dups are flagged against their originals") {
    implicit val s = spark
    import s.implicits._
    val data = corpus(100)
    val flagged = DocStream.nearDupFlags(data.toDS())
      .collect().groupBy(_.doc_id).view.mapValues(_.map(_.dup_of).min).toMap
    val longDocs = data.filter(d =>
      d.doc_id < 1000000L && d.text.trim.split("\\s+").length >= 20).map(_.doc_id)
    // copies of reasonably long docs must be flagged, usually against the original
    val copies = longDocs.map(_ + 1000000L)
    val hit = copies.count(flagged.contains)
    assert(hit >= (copies.size * 0.8).toInt,
      s"only $hit of ${copies.size} planted dups flagged")
    // no original (first-seen) doc is ever flagged against a later id
    flagged.foreach { case (doc, dupOf) => assert(dupOf < doc) }
  }

  test("state persists across restarts: later dup flagged against earlier batch") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val original = DocStream.Doc(1L,
      "the quick brown fox jumps over the lazy dog again and again tonight")
    val dup = DocStream.Doc(2L,
      "the quick brown fox jumps over the lazy dog again and again tonight")
    val unrelated = DocStream.Doc(3L,
      "completely different words about parquet files and shuffle partitions")
    val mem = MemoryStream[DocStream.Doc]
    // two sequential AvailableNow runs over one checkpoint: the second run
    // recovers the first's bucket state, so a dup arriving after a restart
    // is still flagged against the earlier document. The sink must be
    // checkpoint-recoverable, so flags land in a parquet dir (the memory
    // sink refuses recovery).
    val base = java.nio.file.Files.createTempDirectory("docstream-ckpt").toString
    val ckpt = s"$base/ckpt"
    val outDir = s"$base/flags"
    val flagSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dup_of", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("est_jaccard", org.apache.spark.sql.types.DoubleType)))
    // poll OBSERVABLE completion (a new checkpoint commit + the expected
    // sink rows) instead of query lifecycle: the ProcessingTimeTimeout
    // state operator holds the AvailableNow query alive for its TTL
    // timers — awaitTermination waited out its full timeout (~6 min
    // across both runs) and processAllAvailable never gets signaled.
    // The commit file is the restart semantics under test: state for
    // the batch is durable once ckpt/commits/<n> lands.
    def commitCount(): Int = {
      val d = java.nio.file.Paths.get(s"$ckpt/commits")
      if (!java.nio.file.Files.isDirectory(d)) 0
      else {
        val s = java.nio.file.Files.list(d)
        try s.filter(p => !p.getFileName.toString.startsWith(".")).count().toInt
        finally s.close()
      }
    }
    def runBatch(expected: Set[(Long, Long)]): Set[(Long, Long)] = {
      val commits0 = commitCount()
      def read() = spark.read.schema(flagSchema).parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = DocStream.nearDupFlags(mem.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        awaitUntil(120000)(commitCount() > commits0 && read() == expected)
        read()
      } finally q.stop()
    }
    mem.addData(Seq(original, unrelated))
    assert(runBatch(Set.empty).isEmpty) // nothing dup yet
    mem.addData(Seq(dup)) // arrives after a full stop/restart
    val flags = runBatch(Set((2L, 1L)))
    assert(flags == Set((2L, 1L)),
      s"expected doc 2 flagged against doc 1 from the EARLIER run's state, got $flags")
  }

  test("event-time TTL: late dup within TTL flagged; expired bucket is not") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val aText = "the quick brown fox jumps over the lazy dog again and again tonight"
    val mem = MemoryStream[DocStream.DocEvent]
    val base = java.nio.file.Files.createTempDirectory("docstream-evt").toString
    val flagSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dup_of", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("est_jaccard", org.apache.spark.sql.types.DoubleType)))
    def runBatch(): Set[(Long, Long)] = {
      val q = DocStream.nearDupFlagsEventTime(mem.toDS(),
        stateTtlMs = 3600000L, watermarkDelay = "10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .format("parquet").option("path", s"$base/flags")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination(180000)
        spark.read.schema(flagSchema).parquet(s"$base/flags")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
    // run 1: the original + a watermark carrier in another bucket
    mem.addData(Seq(
      DocStream.DocEvent(1L, aText, ts("10:00")),
      DocStream.DocEvent(3L, "completely different words about parquet files", ts("10:05"))))
    assert(runBatch().isEmpty)
    // run 2 (replay): duplicate arrives LATE — event time 10:02, behind the
    // 10:05 max but inside the watermark delay and the 1h event-time TTL
    mem.addData(Seq(DocStream.DocEvent(2L, aText, ts("10:02"))))
    assert(runBatch() == Set((2L, 1L)),
      "late duplicate within the event-time TTL must be flagged")
    // runs 3+4: watermark advances past 10:02 + 1h -> the bucket times out
    // (timeouts fire for groups WITHOUT new data, one trigger after the
    // watermark passes the timeout timestamp)
    mem.addData(Seq(DocStream.DocEvent(4L, "unrelated text one about shuffle partitions", ts("13:00"))))
    runBatch()
    mem.addData(Seq(DocStream.DocEvent(5L, "unrelated text two about broadcast joins", ts("13:01"))))
    runBatch()
    // run 5: a fresh duplicate of the original, after the bucket expired
    mem.addData(Seq(DocStream.DocEvent(6L, aText, ts("12:55"))))
    val finalFlags = runBatch()
    assert(!finalFlags.exists(_._1 == 6L),
      s"bucket should have expired by event time, got $finalFlags")
  }

  test("streaming postings-delta sink converges to the batch-built index") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.InvertedIndex
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val delta = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
      .orderBy("doc_id")
      .collect().map(r => DocStream.Doc(r.getLong(0), r.getString(1))).toSeq
    val streamed = java.nio.file.Files.createTempDirectory("idx_stream").toString
    val full = java.nio.file.Files.createTempDirectory("idx_stream_full").toString
    InvertedIndex.write(base, col("doc_id"), col("text"), streamed, nBuckets = 16)
    InvertedIndex.write(docs, col("doc_id"), col("text"), full, nBuckets = 16)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocStream.Doc]
    // two micro-batches: convergence must not depend on batch boundaries
    val (d1, d2) = delta.splitAt(delta.size / 2)
    mem.addData(d1)
    mem.addData(d2)
    val sink = DocStream.postingsDeltaSink(streamed)
    val q = mem.toDF()
      .writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    // stream-appended index ≡ full rebuild: sidecar stats bit-equal,
    // served results row-equal
    assert(InvertedIndex.readStats(spark, streamed) ===
      InvertedIndex.readStats(spark, full))
    val terms = Seq("scan", "filter", "vector")
    def serve(p: String) = InvertedIndex.bm25TopK(spark, p, terms, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    assert(serve(streamed) === serve(full))

    // replaying an already-applied batch is a no-op (the _applied marker)
    val statsBefore = InvertedIndex.readStats(spark, streamed)
    sink(d1.toDF(), 0L)
    assert(InvertedIndex.readStats(spark, streamed) === statsBefore,
      "replayed batch 0 must not double-append")
  }

  test("streaming change-feed sink: upserts and deletes across micro-batches, last batch wins") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.InvertedIndex
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val streamed = java.nio.file.Files.createTempDirectory("idx_feed").toString
    val reb = java.nio.file.Files.createTempDirectory("idx_feed_reb").toString
    InvertedIndex.write(docs, col("doc_id"), col("text"), streamed, nBuckets = 16)

    // batch 1: rewrite ids ≡ 0 mod 4, delete ids ≡ 1 mod 4;
    // batch 2: re-rewrite a subset of the SAME upserted ids (last wins)
    def rows(df: org.apache.spark.sql.DataFrame, op: String, suffix: String) =
      df.orderBy("doc_id").collect()
        .map(r => DocStream.FeedOp(r.getLong(0),
          if (op == "upsert") r.getString(1) + suffix else "", op)).toSeq
    val b1 = rows(docs.where(pmod(col("doc_id"), lit(4)) === 0), "upsert", " zfeedone") ++
      rows(docs.where(pmod(col("doc_id"), lit(4)) === 1), "delete", "")
    val b2 = rows(docs.where(pmod(col("doc_id"), lit(8)) === 0), "upsert", " zfeedtwo")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocStream.FeedOp]
    // the one-op-per-id contract holds PER micro-batch; b1 and b2 touch
    // the same mod-8 ids, so they must land in separate batches — a
    // checkpointed AvailableNow run per feed wave guarantees that (and
    // exercises restart-continued batchIds through the replay guard)
    val ckpt = java.nio.file.Files.createTempDirectory("idx_feed_ckpt").toString
    def run(): Unit = {
      val q = mem.toDF()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(DocStream.postingsFeedSink(streamed))
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    mem.addData(b1)
    run()
    mem.addData(b2)
    run()

    // after compacting, the index equals a fresh build over the merged
    // corpus: deletes gone, mod-8 docs carry batch 2's text (last wins),
    // the other mod-4 docs carry batch 1's
    InvertedIndex.compact(spark, streamed)
    val merged = docs.where(pmod(col("doc_id"), lit(4)) =!= 1)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(8)) === 0, concat(col("text"), lit(" zfeedtwo")))
          .when(pmod(col("doc_id"), lit(4)) === 0, concat(col("text"), lit(" zfeedone")))
          .otherwise(col("text")).as("text"))
    InvertedIndex.write(merged, col("doc_id"), col("text"), reb, nBuckets = 16)
    assert(InvertedIndex.readStats(spark, streamed) ===
      InvertedIndex.readStats(spark, reb))
    def serve(p: String, t: Seq[String]) =
      InvertedIndex.bm25TopK(spark, p, t, topK = 100)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq
    for (t <- Seq(Seq("scan", "filter"), Seq("zfeedone"), Seq("zfeedtwo")))
      assert(serve(streamed, t) === serve(reb, t), s"drift for $t")
  }

  test("streaming vector-delta sink converges to the batch-built IVF-PQ index") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.{Cluster, IvfPq, ProductQuant}
    val emb = Tables.embeddings(spark, sf)
    val cents = Cluster.fitCentroids(
      emb.select(col("vec_id").as("id"), col("embedding").as("v")), k = 4, iters = 1)
    val pqCents = ProductQuant.fit(emb, col("vec_id"), col("embedding"),
      m = 4, k = 8, iters = 1)
    val base = emb.where(pmod(col("vec_id"), lit(3)) === 0)
    val deltaRows = emb.where(pmod(col("vec_id"), lit(3)) =!= 0)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val streamed = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    val full = java.nio.file.Files.createTempDirectory("ivf_stream_full").toString
    IvfPq.write(base, col("vec_id"), col("embedding"), cents, pqCents, streamed)
    IvfPq.write(emb, col("vec_id"), col("embedding"), cents, pqCents, full)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(deltaRows)
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(DocStream.vectorDeltaSink(streamed, cents, pqCents))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    val anchor = emb.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray.map(_.toDouble)
    def serve(p: String) = IvfPq.serve(spark, p, cents, pqCents, anchor,
        nProbe = 3, topK = 20)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("adc"))).toSeq
    assert(serve(streamed) === serve(full))
  }

  test("streaming payload-delta sink converges to the batch-built media store; replay is a no-op") {
    implicit val s = spark
    import s.implicits._
    import graft.llm.Multimodal
    val ids = (0L until 60L).map(Tuple1(_)).toDF("doc_id")
    val media = Multimodal.syntheticMedia(ids, col("doc_id"))
    val streamed = java.nio.file.Files.createTempDirectory("media_stream").toString
    val full = java.nio.file.Files.createTempDirectory("media_stream_full").toString
    Multimodal.writePayloadStore(
      media.where(pmod(col("media_id"), lit(3)) === 0),
      col("media_id"), streamed, nBuckets = 8)
    Multimodal.writePayloadStore(media, col("media_id"), full, nBuckets = 8)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData((0L until 60L).filter(_ % 3 != 0))
    // the stream carries ids; the sink body synthesizes the payload rows
    // (an ingest pipeline's decode/encode stage) then delegates to the
    // store sink — the replay guard lives in the delegate
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batch, batchId) => DocStream.payloadDeltaSink(streamed)(
        Multimodal.syntheticMedia(batch, col("value")), batchId)
    val q = mem.toDF().writeStream.foreachBatch(sink)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()

    val probe = Seq(1L, 2L, 3L, 47L)
    def fetched(p: String) = Multimodal.fetchPayloads(spark, p, probe)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq)
      .sortBy(_._1).toSeq
    assert(fetched(streamed) === fetched(full))
    // replaying an applied batch is a no-op (the _applied marker)
    val genBefore = Multimodal.payloadStoreGen(spark, streamed)
    sink((0L until 60L).filter(_ % 3 != 0).toDF("value"), 0L)
    assert(Multimodal.payloadStoreGen(spark, streamed) === genBefore,
      "replayed batch 0 must not double-append")
  }

  test("state cap bounds bucket growth") {
    implicit val s = spark
    import s.implicits._
    // 50 identical docs in one bucket with cap 10: flags still emitted,
    // state never exceeds the cap (no OOM-shaped growth path)
    val same = (0 until 50).map(i => DocStream.Doc(i.toLong, "alpha beta gamma delta epsilon zeta"))
    val flags = DocStream.nearDupFlags(same.toDS(), maxBucketSize = 10)
      .collect()
    assert(flags.map(_.doc_id).distinct.length == 49) // all but doc 0 flagged
    assert(flags.forall(_.est_jaccard == 1.0))
  }
}
