package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed linear classifier apply: weight range, empty-doc identity,
  * determinism, and the narrow plan shape the 100-TB sweep depends on.
  */
class HashClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("empty docs score feat_mean 0 and prob 0.5; weights stay in [-1, 1)") {
    val df = Seq("", "  ", "hash scan filter", "the the the").toDF("text")
      .select(TextStats.tokens(lower(col("text"))).as("t"))
      .select(HashClassifier.featMean(col("t")).as("fm"),
        HashClassifier.prob(col("t")).as("p"))
      .collect()
    assert(df(0).getDouble(0) === 0.0 && df(0).getDouble(1) === 0.5)
    assert(df(1).getDouble(0) === 0.0 && df(1).getDouble(1) === 0.5)
    df.foreach { r =>
      assert(r.getDouble(0) >= -1.0 && r.getDouble(0) < 1.0)
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0 ||
        r.getDouble(1) === 0.5)
    }
  }

  test("single-token doc scores exactly its bucket weight; repetition preserves the mean") {
    val Seq(one, rep) = Seq("scan", "scan scan scan").toDF("text")
      .select(HashClassifier.featMean(
        TextStats.tokens(lower(col("text")))).as("fm"))
      .as[Double].collect().toSeq
    assert(math.abs(one - rep) < 1e-12, s"$one vs $rep")
    // and the weight is the closed-form mix of the md5 bucket
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("scan".getBytes("UTF-8")).take(4)
      .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    val want = (h % HashClassifier.Buckets * HashClassifier.Mix %
      HashClassifier.WeightMod).toDouble / HashClassifier.WeightMod * 2 - 1
    assert(math.abs(one - want) < 1e-12, s"$one vs $want")
  }

  test("learned-weight lookup path is bit-identical to the placeholder expression") {
    // the (bucket, weight) table carrying exactly the placeholder
    // weights must reproduce the expression path double-for-double —
    // then a real trained model is a data swap, not a code change
    val table = HashClassifier.placeholderWeights.zipWithIndex
      .map { case (w, b) => (b, w) }.toSeq.toDF("bucket", "weight")
    val w = HashClassifier.weightsFrom(table, col("bucket"), col("weight"))
    assert(w.toSeq === HashClassifier.placeholderWeights.toSeq)
    val toks = TextStats.tokens(lower(col("text")))
    val rows = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        HashClassifier.featMean(toks).as("expr_fm"),
        HashClassifier.featMeanWith(spark, toks, w).as("lookup_fm"),
        HashClassifier.prob(toks).as("expr_p"),
        HashClassifier.probWith(spark, toks, w).as("lookup_p"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"doc ${r.getLong(0)} featMean")
      assert(r.getDouble(3) === r.getDouble(4), s"doc ${r.getLong(0)} prob")
    }
  }

  test("weightsFrom rejects out-of-range, duplicate, and oversized tables; defaults unlisted to 0") {
    val ok = HashClassifier.weightsFrom(
      Seq((3, 0.25)).toDF("bucket", "weight"), col("bucket"), col("weight"))
    assert(ok(3) === 0.25 && ok.sum === 0.25) // unlisted buckets are 0
    intercept[IllegalArgumentException] {
      HashClassifier.weightsFrom(
        Seq((HashClassifier.Buckets, 1.0)).toDF("bucket", "weight"),
        col("bucket"), col("weight"))
    }
    intercept[IllegalArgumentException] {
      HashClassifier.weightsFrom(
        Seq((1, 0.5), (1, 0.7)).toDF("bucket", "weight"),
        col("bucket"), col("weight"))
    }
  }

  test("scoring plans as one narrow projection: no shuffle, no generate") {
    val plan = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        HashClassifier.prob(TextStats.tokens(lower(col("text")))).as("p"))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
    assert(plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty)
  }
}
