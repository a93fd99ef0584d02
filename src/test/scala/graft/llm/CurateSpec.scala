package graft.llm

import graft.SparkSpec
import graft.operators.{SkewJoin, TopK}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: vocabulary/token-ids, normalization,
  * snapshot diff, salted skew join, per-group top-k.
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  // ----------------------------------------------------------------- vocab

  test("vocab ranks by count desc then token asc, contiguous from 1") {
    val df = Seq("b b b a a c", "a c c", "").toDF("text")
    val v = Vocab.build(df, col("text"), 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // counts: a=3, b=3, c=3 -> all tie on count, rank by token
    assert(v.toSeq == Seq((1, "a", 3L), (2, "b", 3L), (3, "c", 3L)))
  }

  test("vocab truncates to n and lowercases") {
    val df = Seq("X x y Z z z").toDF("text")
    val v = Vocab.build(df, col("text"), 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((1, "z", 3L), (2, "x", 2L)))
  }

  test("tokenIds maps OOV to 0 and digests ids in token order") {
    val docs = Seq((1L, "b a q b"), (2L, "   "), (3L, "q q")).toDF("id", "text")
    val vocab = Vocab.build(docs, col("text"), 2)
    val got = Vocab.tokenIds(docs, col("id"), col("text"), vocab)
      .orderBy("id").collect()
    // counts: q=3, b=2, a=1 -> vocab (1,q),(2,b); a is OOV
    val r1 = got(0)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 1) // 4 tokens, 1 OOV (a)
    // doc 1 "b a q b" -> ids 2,0,1,2
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("2,0,1,2".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r1.getString(3) == expectedMd5)
    // whitespace-only doc: no tokens, null digest
    assert(got(1).getLong(1) == 0 && got(1).getLong(2) == 0 && got(1).isNullAt(3))
    assert(got(2).getLong(1) == 2 && got(2).getLong(2) == 0)
  }

  test("tokenIds is a single narrow pass: no shuffle, no join") {
    val docs = graft.Tables.documents(spark, sf)
    val vocab = Vocab.build(docs, col("text"), 16)
    val plan = Vocab.tokenIds(docs, col("doc_id"), col("text"), vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"token-id mapping should shuffle nothing (broadcast-map kernel):\n$plan")
  }

  test("tokenIds kernel matches the column-algebra form exactly") {
    // the kernel must reproduce Spark's lower/trim/split semantics
    // token-for-token; pin equality against the previous explode+regroup
    // implementation on the corpus plus whitespace/unicode edge cases
    def columnForm(docs: org.apache.spark.sql.DataFrame,
        vocab: org.apache.spark.sql.DataFrame) = {
      val pos = docs.select(col("id"),
        posexplode_outer(TextStats.tokens(lower(col("text")))).as(Seq("pos", "token")))
      pos.join(broadcast(vocab.select(col("token"), col("rank"))), Seq("token"), "left")
        .select(col("id"), col("pos"), col("token"),
          when(col("token").isNotNull, coalesce(col("rank"), lit(0))).as("tid"))
        .groupBy("id").agg(
          count(col("token")).as("n_tok"),
          sum(when(col("token").isNotNull && col("tid") === 0, 1L).otherwise(0L)).as("n_oov"),
          when(count(col("token")) === 0, lit(null).cast("string"))
            .otherwise(md5(concat_ws(",",
              transform(array_sort(collect_list(
                when(col("token").isNotNull, struct(col("pos"), col("tid"))))),
                s => s.getField("tid").cast("string"))).cast("binary"))).as("ids_md5"))
    }
    val edge = Seq(
      (9000001L, null.asInstanceOf[String]), (9000002L, ""), (9000003L, "   "),
      (9000004L, "\tleading tab"), (9000005L, "trailing newline\n"),
      (9000006L, "CafÉ  du jour İ"), (9000007L, "a  b\r\nc"))
      .toDF("id", "text")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text")).unionByName(edge)
    val vocab = Vocab.build(docs, col("text"), 32)
    val kernel = Vocab.tokenIds(docs, col("id"), col("text"), vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    val algebra = columnForm(docs, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(kernel == algebra,
      s"kernel/algebra divergence: onlyKernel=${kernel.diff(algebra).take(3)} onlyAlgebra=${algebra.diff(kernel).take(3)}")
  }

  // ------------------------------------------------------------- normalize

  test("normalize kernel: NFC, lowercase, whitespace collapse, trim") {
    // e + combining acute (NFD) composes to é, then lowercases
    val nfd = "Café  \t DU JOUR\n"
    assert(Normalize.normalize(nfd) == "café du jour")
    assert(Normalize.normalize("  a  b  ") == "a b")
    assert(Normalize.normalize("") == "")
    assert(Normalize.normalize("\t\n") == "")
    assert(Normalize.normalize(null) == null)
    // already-NFC input unchanged apart from case/space
    assert(Normalize.normalize("Café") == "café")
  }

  test("normalize column form matches kernel over corpus sample") {
    val docs = graft.Tables.documents(spark, sf).limit(50)
    val got = docs.select(col("text"), Normalize(col("text")).as("n")).collect()
    got.foreach { r =>
      assert(r.getString(1) == Normalize.normalize(r.getString(0)))
    }
  }

  // ---------------------------------------------------------- snapshot diff

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val nw = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val got = Snapshot.diff(old, nw, col("id"), col("text"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("snapshot diff shuffles digests, not payloads") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Snapshot.diff(docs, docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // the exchange must not carry the text column
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text")),
      s"payload in shuffle:\n$plan")
  }

  // -------------------------------------------------------------- skew join

  test("salted join equals the plain join") {
    val li = graft.Tables.lineitem(spark, sf)
      .withColumn("o_orderkey", col("l_orderkey"))
    val ord = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(ord, "o_orderkey")
      .groupBy("o_orderpriority").count().orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = SkewJoin.salted(li, ord, "o_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), salt = 8)
      .groupBy("o_orderpriority").count().orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.sameElements(plain))
  }

  test("salting spreads a hot key across salt values") {
    val facts = (0 until 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val dim = Seq((1L, "hot")).toDF("k", "v")
    val dimRep = dim.withColumn("_salt", explode(lit((0 until 8).toArray)))
    val saltDist = facts
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .groupBy("_salt").count().collect()
    assert(saltDist.length == 8, "hot key must hit all 8 salt buckets")
    assert(saltDist.map(_.getLong(1)).max < 1000, "no single bucket owns the key")
    // and the join result is complete
    val joined = SkewJoin.salted(facts, dim, "k", xxhash64(col("row_id")), 8)
    assert(joined.count() == 1000)
  }

  test("oversized dim degrades to the plain join, same answer") {
    // degenerate call: the "small" side is NOT small relative to the cap —
    // replicating it would multiply executor memory, so the guard must
    // skip salting (no _salt in the plan) and still produce identical rows
    val facts = (0 until 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "row_id")
    val dim = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val guarded = SkewJoin.salted(facts, dim, "k",
      xxhash64(col("row_id")), salt = 8, maxReplicatedRows = 16)
    assert(!guarded.queryExecution.analyzed.toString.contains("_salt"),
      "guard did not bypass salting for an oversized dim")
    val expected = facts.join(dim, Seq("k"))
      .select("k", "row_id", "v").collect().map(_.toSeq).toSet
    assert(guarded.select("k", "row_id", "v").collect().map(_.toSeq).toSet == expected)
    // under the cap the salted plan is used
    val saltedPlan = SkewJoin.salted(facts, dim, "k",
      xxhash64(col("row_id")), salt = 8, maxReplicatedRows = 1000)
    assert(saltedPlan.queryExecution.analyzed.toString.contains("_salt"))
  }

  // ---------------------------------------------------------------- bm25

  test("bm25 scores match a hand-computed reference") {
    val docs = Seq(
      (1L, "spark spark window"),
      (2L, "merge"),
      (3L, "table scan row"),
      (4L, "")).toDF("id", "text")
    val got = Bm25.topDocs(docs, col("id"), col("text"),
      Seq("spark", "merge"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // N=4, avgdl=(3+1+3+0)/4=1.75; df(spark)=1, df(merge)=1
    val idf = math.log((4 - 1 + 0.5) / (1 + 0.5) + 1)
    def part(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 1.75))
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - r4(part(2, 3))) < 1e-9)
    assert(math.abs(got(2L) - r4(part(1, 1))) < 1e-9)
    // doc 3 matches no term, doc 4 is empty: absent
  }

  test("bm25 prunes to query terms before the shuffle") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Bm25.topDocs(docs, col("doc_id"), col("text"),
      Seq("spark"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("isin") || plan.contains("= spark") ||
      plan.contains("IN (spark"), s"no term prune found:\n$plan")
  }

  // --------------------------------------------------------------- split

  test("splitBucket routes every key and respects rough proportions") {
    val df = (1L to 2000L).toDF("id")
    val got = df.select(Mixing.splitBucket(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("b"))
      .groupBy("b").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.values.sum == 2000)
    assert(got("train") > 1500 && got("train") < 1700, s"train=${got("train")}")
    assert(got("val") > 120 && got("val") < 280)
    assert(got("test") > 120 && got("test") < 280)
    // deterministic rerun
    val again = df.select(Mixing.splitBucket(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("b"))
      .groupBy("b").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == got)
  }

  test("splitBucket rejects non-unit fraction sums") {
    intercept[IllegalArgumentException] {
      Mixing.splitBucket(col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  // ----------------------------------------------------------------- dsir

  test("dsir weights match a hand-computed reference and rank by target-likeness") {
    val docs = Seq(
      (1L, "aaa aaa", true),   // target-domain doc
      (2L, "aaa bbb", false),
      (3L, "bbb bbb", false))
      .toDF("id", "text", "tgt")
    val got = Dsir.weights(docs, col("id"), col("text"), col("tgt"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // raw: aaa=3, bbb=3, nRaw=6; target: aaa=2, nTgt=2; V=2
    def lw(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (2 + 2)) - math.log((cr + 1.0) / (6 + 2))
    def r4h(x: Double) = // HALF_UP away from zero like Spark round()
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wAaa = lw(2, 3); val wBbb = lw(0, 3)
    assert(math.abs(got(1L) - r4h(wAaa)) < 1e-9)
    assert(math.abs(got(2L) - r4h((wAaa + wBbb) / 2)) < 1e-9)
    assert(math.abs(got(3L) - r4h(wBbb)) < 1e-9)
    assert(got(1L) > got(2L) && got(2L) > got(3L), "target-likeness order")
  }

  test("dsir log-ratio table joins broadcast (map-side scoring)") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Dsir.weights(docs, col("doc_id"), col("text"),
      col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"log-ratio join not broadcast:\n$plan")
  }

  test("bm25 df table joins broadcast") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Bm25.topDocs(docs, col("doc_id"), col("text"),
      Seq("spark", "merge"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"df-table join not broadcast:\n$plan")
  }

  // ---------------------------------------------------------------- fuzzy

  test("del1 kernel emits the string and each single deletion, distinct") {
    assert(Fuzzy.del1("abc").toSet == Set("abc", "bc", "ac", "ab"))
    assert(Fuzzy.del1("aa").toSet == Set("aa", "a")) // collapsed duplicates
    assert(Fuzzy.del1("x").toSet == Set("x", ""))
    assert(Fuzzy.del1("").toSet == Set(""))
  }

  test("fuzzy blocking finds exactly the levenshtein<=1 pairs") {
    val keys = Seq("spark", "spork", "sparks", "park", "brick", "brisk",
      "table", "cable", "fable", "zzz").toDF("k")
    val got = Fuzzy.keyPairs(keys, col("k"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force reference
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ks = keys.collect().map(_.getString(0))
    val expect = (for {
      a <- ks; b <- ks if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == expect)
    // sanity on content: substitutions, insertions, deletions all present
    assert(got.contains(("spark", "spork")))  // substitution
    assert(got.contains(("spark", "sparks"))) // insertion
    assert(got.contains(("park", "spark")))   // deletion
    assert(!got.exists(p => p._1 == "brick" && p._2 == "table"))
  }

  test("fuzzy hot-bucket cap bounds work deterministically") {
    // 30 keys differing in the last char all share the "ke" variant
    val keys = (0 until 30).map(i => "ke" + ('a' + i % 26).toChar + i / 26)
      .distinct.toDF("k")
    val capped = Fuzzy.keyPairs(keys, col("k"), maxBucket = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val full = Fuzzy.keyPairs(keys, col("k"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.subsetOf(full), "cap must only REMOVE pairs")
    assert(capped.nonEmpty && capped.size < full.size,
      s"cap did not bind: ${capped.size} vs ${full.size}")
    // deterministic under rerun
    val again = Fuzzy.keyPairs(keys, col("k"), maxBucket = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(again == capped)
  }

  // ----------------------------------------------------------- sequences

  test("sequences splits documents into c-token chunks in order") {
    val docs = Seq((1L, (1 to 10).map("w" + _).mkString(" ")), (2L, "  "))
      .toDF("id", "text")
    val got = ChunkDedup.sequences(docs, col("id"), col("text"), c = 4)
      .orderBy("id", "seq_idx").collect()
    assert(got.length == 3) // 10 tokens -> 4+4+2; empty doc -> none
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 4L, 2L))
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = md.digest("w9 w10".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(2).getString(3) == exp)
  }

  // ----------------------------------------------------------- top-k/group

  test("perGroup keeps k best per group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 5L), ("a", 4L, 20L),
      ("b", 5L, 1L)).toDF("g", "id", "score")
    val got = TopK.perGroup(df, col("g"), col("score"), col("id"), 2)
      .select("g", "id", "rk").orderBy("g", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 4L, 1), ("a", 1L, 2), ("b", 5L, 1)))
  }

  test("perGroup window partitions by the group key (no global window)") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = TopK.perGroup(docs, col("source"), col("n_chars"),
      col("doc_id"), 5).queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("source")),
      s"window not partitioned by group:\n$plan")
  }

  test("temperature weights: alpha=0.5 up-weights small sources, sums to 1") {
    val df = Seq(
      ("a", "w x y z"),
      ("b", "w x y z"), ("b", "w x y z"), ("b", "w x y z"), ("b", "w x y z")
    ).toDF("source", "text")
    val out = Mixing.temperatureWeights(df, col("source"),
        size(TextStats.tokens(col("text"))), alpha = 0.5)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // tokens: a=4, b=16; sqrt: 2 and 4, denom 6 -> 1/3 and 2/3
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 1L, 4L), ("b", 4L, 16L)))
    assert(math.abs(out(0)._4 - 1.0 / 3) < 1e-12)
    assert(math.abs(out(1)._4 - 2.0 / 3) < 1e-12)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
    // natural proportions at alpha=1
    val nat = Mixing.temperatureWeights(df, col("source"),
        size(TextStats.tokens(col("text"))), alpha = 1.0)
      .orderBy("stratum").collect().map(_.getDouble(3))
    assert(math.abs(nat(0) - 0.2) < 1e-12 && math.abs(nat(1) - 0.8) < 1e-12)
    intercept[IllegalArgumentException](
      Mixing.temperatureWeights(df, col("source"), lit(1), alpha = 0.0))
  }

  test("zipf profile: shares of corpus total, cumulative share monotone") {
    val df = Seq("b b b a a", "c").toDF("text")
    val out = Vocab.zipfProfile(df, col("text"), 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // counts b=3 a=2 c=1, total 6; top-2 is b then a
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1, "b", 3L), (2, "a", 2L)))
    assert(math.abs(out(0)._4 - 0.5) < 1e-12 && math.abs(out(0)._5 - 0.5) < 1e-12)
    assert(math.abs(out(1)._4 - 2.0 / 6) < 1e-12)
    assert(math.abs(out(1)._5 - 5.0 / 6) < 1e-12)
  }

  test("bpe pair counts: occurrence-weighted, single-char tokens excluded") {
    val df = Seq("abc abc bc x").toDF("text")
    val out = Vocab.bpePairCounts(df, col("text"), 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // abc(cnt 2) -> ab,bc each 2; bc(cnt 1) -> bc 1; x has no pair
    assert(out.toSeq == Seq(("bc", 3L), ("ab", 2L)))
  }

  test("applyChanges: upserts replace, deletes remove, untouched pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val changes = Seq(
      (2L, "delete", "ignored"),
      (3L, "upsert", "c2"),
      (6L, "upsert", "f")
    ).toDF("id", "op", "v").select(col("id"), col("op"), col("v"))
    val out = Snapshot.applyChanges(base, changes, "id", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (3L, "c2"), (4L, "d"), (6L, "f")))
  }

  test("ragChunks: overlapping windows, short tail, empty doc emits nothing") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "  "))
      .toDF("id", "text")
    val out = ChunkDedup.ragChunks(docs, col("id"), col("text"),
        size = 4, stride = 3)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    // starts 0,3,6,9 -> lengths 4,4,4,1
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 0L, 4), (1L, 1L, 4), (1L, 2L, 4), (1L, 3L, 1)))
    // overlap: chunk 1 starts at t3, shares t3 with chunk 0's tail
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0)._4 == md5("t0 t1 t2 t3") && out(3)._4 == md5("t9"))
    intercept[IllegalArgumentException](
      ChunkDedup.ragChunks(docs, col("id"), col("text"), size = 4, stride = 5))
    intercept[IllegalArgumentException](
      ChunkDedup.ragChunks(docs, col("id"), col("text"), size = 0))
  }
}
