package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

/** Round-7 quality/curation operators: Gopher rules, char entropy,
  * corpus-wide line dedup, weighted sampling.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopher rules: hand-computed rule vector on crafted docs") {
    val docs = Seq(
      // 60 words incl. "the ... and", all alpha, mean len in [3,10] → keep
      (1L, (("the " * 2) + ("and " * 2) + ("batch " * 56)).trim),
      (2L, "too short to pass the word count and rules"), // 9 words
      (3L, (("the " * 2) + ("and " * 2) + ("x " * 56)).trim), // mean len < 3
      (4L, (("## " * 20) + ("the " * 30) + ("and " * 30)).trim), // symbols
      (5L, ("batch " * 60).trim) // no stopwords
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +: Gopher.ruleColumns(col("text")): _*)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("keep")).toSeq === Seq(1, 0, 0, 0, 0))
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") === 60L)
    assert(r1.getAs[Int]("stop_hits") === 4)
    assert(r1.getAs[Double]("alpha_frac") === 1.0)
    // doc 4: 20 '#' pairs → 40 hash chars over 80 words = 0.5 ratio
    assert(out(3).getAs[Double]("symbol_ratio") === 0.5)
  }

  test("gopher rules: empty and whitespace-only docs are rejected, not NaN") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +: Gopher.ruleColumns(col("text")): _*)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[Int]("keep") === 0)
      assert(r.getAs[Double]("mean_wlen") === 0.0)
      assert(r.getAs[Double]("alpha_frac") === 0.0)
    }
  }

  test("char entropy: closed-form cases") {
    // "aaaa" → H=0, 1 distinct; "abab" → H=1, 2; "abcd" → H=2, 4
    assert(Gopher.charEntropy("aaaa") === ((0.0, 1)))
    assert(Gopher.charEntropy("abab")._1 === 1.0 +- 1e-12)
    assert(Gopher.charEntropy("abcd")._1 === 2.0 +- 1e-12)
    assert(Gopher.charEntropy("") === ((0.0, 0)))
    assert(Gopher.charEntropy(null) === ((0.0, 0)))
  }

  test("gopher kernel ≡ column algebra on the corpus plus edge cases") {
    val edge = Seq((9001L, "a... b…c ## the #and"), (9002L, "  x  "),
      (9003L, "....... the and"), (9004L, "of to in is it"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .union(edge)
    val k = docs.select(col("doc_id") +: Gopher.ruleColumns(col("text")): _*)
      .orderBy("doc_id").collect()
    val a = docs.select(col("doc_id") +: Gopher.ruleColumnsAlgebra(col("text")): _*)
      .orderBy("doc_id").collect()
    assert(k.length === a.length)
    k.zip(a).foreach { case (kr, ar) => assert(kr === ar, s"kernel≠algebra: $kr vs $ar") }
  }

  test("word windows kernel ≡ column algebra on the corpus plus edge cases") {
    val edge = Seq((9001L, "a b c d e f g"), (9002L, "  x  "), (9003L, ""),
      (9004L, "one"), (9005L, "a  b   c"))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .union(edge)
    val k = docs.select(col("doc_id"), LineDedup.wordWindows(col("text"), 3).as("w"))
      .orderBy("doc_id").collect()
    val a = docs.select(col("doc_id"), LineDedup.wordWindowsAlgebra(col("text"), 3).as("w"))
      .orderBy("doc_id").collect()
    k.zip(a).foreach { case (kr, ar) =>
      assert(kr.getSeq[String](1) === ar.getSeq[String](1), s"id ${kr.get(0)}")
    }
  }

  test("word windows: partial tail window and empty text") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "")).toDF("id", "t")
    val out = df.select(col("id"),
        LineDedup.wordWindows(col("t"), 3).as("w"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) === Seq("a b c", "d e f", "g"))
    assert(out(1).getSeq[String](1) === Seq("x y"))
    assert(out(2).getSeq[String](1) === Seq.empty[String])
  }

  test("line dedup: corpus-wide threshold strips exactly the over-occurring lines") {
    // "p q r" occurs 3x corpus-wide (> maxOccur=2) → stripped everywhere;
    // "u v w" occurs 2x → kept.
    val docs = Seq(
      (1L, "p q r u v w"),
      (2L, "p q r a b c"),
      (3L, "p q r u v w")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, col("doc_id"),
        LineDedup.wordWindows(col("text"), 3), maxOccur = 2)
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Int]("n_lines"),
      r.getAs[Int]("n_kept"))).toSeq ===
      Seq((1L, 2, 1), (2L, 2, 1), (3L, 2, 1)))
    // doc 1 keeps "u v w"; md5 must digest exactly that
    val md5uvw = java.security.MessageDigest.getInstance("MD5")
      .digest("u v w".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("kept_md5") === md5uvw)
  }

  test("line dedup: document with every line stripped hashes empty string") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p q")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, col("doc_id"),
        LineDedup.wordWindows(col("text"), 2), maxOccur = 2)
      .orderBy("id").collect()
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    out.foreach { r =>
      assert(r.getAs[Int]("n_kept") === 0)
      assert(r.getAs[String]("kept_md5") === md5empty)
    }
  }

  test("weighted sampling: zero-weight-free, deterministic, weight-sensitive") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) 1.0 else 100.0))
      .toDF("id", "w")
    val a = WeightedSample.sample(df, col("id"), col("w"), n = 40)
      .select("id").as[Long].collect().toSeq
    val b = WeightedSample.sample(df, col("id"), col("w"), n = 40)
      .select("id").as[Long].collect().toSeq
    assert(a === b, "same ids in the same order across reruns")
    // heavy ids (w=100) must dominate the sample
    val heavy = a.count(_ > 100L)
    assert(heavy > 30, s"expected heavy-weight dominance, got $heavy/40")
  }

  test("weighted sampling key matches the closed-form md5 derivation") {
    val df = Seq((7L, 2.0)).toDF("id", "w")
    val got = WeightedSample.sample(df, col("id"), col("w"), n = 1)
      .select("skey").as[Double].head()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
    val expected = BigDecimal(math.log((v + 1d) / math.pow(2d, 32d)) / 2.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === expected)
  }
}
