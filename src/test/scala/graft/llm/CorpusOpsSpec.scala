package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 corpus operators: Bloom incremental dedup, TF-IDF keyword
  * extraction, boilerplate n-gram frequency.
  */
class CorpusOpsSpec extends SparkSpec {

  test("incremental dedup keeps exactly the delta rows absent from the corpus") {
    import spark.implicits._
    val corpus = Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "bbb"))
      .toDF("id", "text")
    val delta = Seq((10L, "bbb"), (11L, "new one"), (12L, "ccc"),
      (13L, "another new"), (14L, "new one"))
      .toDF("id", "text")
    val out = Incremental.newRows(corpus, col("text"), delta, col("text"))
      .select("id").as[Long].collect().sorted
    // 10 (bbb) and 12 (ccc) are corpus dups; 11/13/14 are new — including
    // BOTH copies of "new one": intra-delta dup is a separate concern
    assert(out.toSeq == Seq(11L, 13L, 14L))
  }

  test("incremental dedup is exact under a saturated (all-positive) filter") {
    import spark.implicits._
    // 1-item filter at high fpp → mightContain is ~always true; the verify
    // join must still drop every false positive
    val corpus = Seq((1L, "only")).toDF("id", "text")
    val delta = (1 to 50).map(i => (i.toLong + 100, s"d$i")) :+ ((200L, "only"))
    val out = Incremental.newRows(corpus, col("text"),
        delta.toDF("id", "text"), col("text"),
        expectedItems = 1, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(out == (101L to 150L).toSet, "false positives must be verified away")
  }

  test("incremental dedup with a prebuilt reusable filter") {
    import spark.implicits._
    val corpus = Seq((1L, "x"), (2L, "y")).toDF("id", "text")
    val hashed = corpus.select(xxhash64(col("text")).as("h"))
    val bf = hashed.stat.bloomFilter("h", 100, 0.01)
    val delta = Seq((10L, "x"), (11L, "z")).toDF("id", "text")
    val out = Incremental.dedupAgainstFilter(corpus, col("text"),
        delta, col("text"), bf)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(11L))
  }

  test("tf-idf ranks the distinctive term above the ubiquitous one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common third")
    ).toDF("id", "text")
    val top = TfIdf.topTerms(docs, col("id"), col("text"), k = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("term")).toMap
    // "common" is in every doc → idf = ln(1) = 0; each doc's unique word wins
    assert(top(1L) == "rare" && top(2L) == "other" && top(3L) == "third")
  }

  test("tf-idf scores and ranks match the definition") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),
      (2L, "b c")
    ).toDF("id", "text")
    val rows = TfIdf.topTerms(docs, col("id"), col("text"), k = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rk"),
        r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Double]("score")))
    val byDoc = rows.groupBy(_._1)
    // doc 1: a tf=2 df=1 → 2·ln2 ≈ 1.386294; b tf=1 df=2 → ln1 = 0
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("a", "b"))
    assert(math.abs(d1.head._5 - 2 * math.log(2)) < 1e-5)
    // doc 2: c tf=1 df=1 → ln2 beats b's 0; ties would break by term asc
    val d2 = byDoc(2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq == Seq("c", "b"))
    assert(d2.last._5 == 0.0)
  }

  test("blank and sub-n docs contribute nothing") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two"), (4L, "x y z w"))
      .toDF("id", "text")
    assert(TfIdf.tokens(docs, col("id"), col("text")).count() == 6)
    val grams = Boilerplate.gramDocFrequency(docs, col("text"), n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grams == Map("x y z" -> 1L, "y z w" -> 1L))
  }

  test("boilerplate top grams count document frequency, not occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the same gram the same gram"), // "the same gram" twice in ONE doc
      (2L, "the same gram elsewhere"),
      (3L, "unrelated words entirely here")
    ).toDF("id", "text")
    val top = Boilerplate.topGrams(docs, col("text"), n = 3, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // distinct-per-doc: "the same gram" counts 2 (docs 1 and 2), not 3
    assert(top.head == ("the same gram" -> 2L))
    assert(top(1)._2 == 1L)
  }

  test("top grams tie-break is gram-ascending") {
    import spark.implicits._
    val docs = Seq((1L, "b b b"), (2L, "a a a")).toDF("id", "text")
    val top = Boilerplate.topGrams(docs, col("text"), n = 3, k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("a a a", "b b b"))
  }
}
