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

  test("train learns the label signal and serves through weightsFrom/probWith") {
    val toks = TextStats.tokens(lower(col("text")))
    val docs = graft.Tables.documents(spark, sf)
    val label = array_contains(toks, "data")
    val table = HashClassifier.train(docs, col("doc_id"), toks, label,
      iters = 2, lr = 10.0)
    // the learned table is bounded by the feature space and the label
    // token's bucket carries the LARGEST positive weight — the model
    // actually learned the signal, it isn't noise
    val weights = table.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(weights.size <= HashClassifier.Buckets)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("data".getBytes("UTF-8")).take(4)
      .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    val labelBucket = md % HashClassifier.Buckets
    assert(weights(labelBucket) === weights.values.max,
      s"label token's bucket $labelBucket is not the strongest feature")
    // served through the existing consume path, the learned model beats
    // chance on its own training labels (sanity, not a benchmark)
    val w = HashClassifier.weightsFrom(table, col("bucket"), col("weight"))
    val scored = docs
      .select(label.cast("int").as("y"),
        (HashClassifier.featMeanWith(spark, toks, w) > 0).cast("int").as("pred"))
      .where(size(toks) > 0)
    val acc = scored.agg(avg((col("y") === col("pred")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.6, s"trained model accuracy $acc is no better than chance")
  }

  test("train is invariant under repartitioning (6-dp rounding absorbs sum order)") {
    val toks = TextStats.tokens(lower(col("text")))
    val docs = graft.Tables.documents(spark, sf)
    def fit(d: org.apache.spark.sql.DataFrame) =
      HashClassifier.train(d, col("doc_id"), toks,
        array_contains(toks, "data"), iters = 2, lr = 10.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fit(docs.repartition(13)) === fit(docs.coalesce(1)))
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
