package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's synthetic tables by an integer factor for scaling
  * benchmarks (`ScaleData <srcSfDir> <dstDir> [factor] [tables]`): a 10×
  * sf1 run against the sf0.1 bench proves no stage is accidentally
  * quadratic; the 100× run probes memory ceilings and constant-vs-linear
  * crossover.
  *
  * Each copy k gets disjoint ids AND copy-specific perturbations chosen so
  * cross-copy rows are NOT near-duplicates of each other: otherwise every
  * doc would gain factor-1 near-dup twins and the LSH pair count would grow
  * quadratically in the factor — a data artifact that would mask the
  * engine's own scaling. Documents suffix every word with ~k (disjoint
  * shingles; within-copy structure untouched); embeddings rotate the vector
  * by k mod dim positions and, once the rotations wrap (k ≥ dim), flip the
  * sign of alternating coordinates — both transforms preserve norms and
  * leave cross-copy cosines of synthetic vectors uncorrelated, so no two
  * of up-to-2·dim copies coincide. Dimension-like tables
  * (part/nation/region/orders) copy verbatim — dims scale sublinearly in
  * real warehouses and part stays broadcastable.
  *
  * The optional 4th arg restricts output to a comma-separated table list
  * (e.g. `documents,embeddings` for the LSH-heavy scaling suite) so a
  * 100× run doesn't pay for 60M lineitem rows it never reads.
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    // --shared-vocab (anywhere in args): documents copies keep their
    // ORIGINAL words — no ~k suffix — so every term's posting list grows
    // ×factor with the corpus. This is the LONG-POSTINGS regime the
    // default perturbation deliberately avoids (disjoint vocab keeps LSH
    // pair counts linear): use it ONLY for posting-length benchmarks
    // (tools/LongPostBench), never for the dedup/LSH scaling suite.
    val sharedVocab = args.contains("--shared-vocab")
    val pos = args.filterNot(_.startsWith("--"))
    val src = pos(0)
    val dst = pos(1)
    val factor = pos.lift(2).map(_.toInt).getOrElse(10)
    val tableFilter: Option[Set[String]] =
      pos.lift(3).map(_.split(",").map(_.trim).toSet)
    def wanted(name: String): Boolean = tableFilter.forall(_.contains(name))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => f(df, k)).reduce(_ unionByName _)

    def write(df: => DataFrame, name: String): Unit = if (wanted(name)) {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // fact tables: disjoint key ranges per copy
    write(copies(spark.read.parquet(s"$src/lineitem.parquet"))((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + k.toLong * 10000000L)), "lineitem")

    write(copies(spark.read.parquet(s"$src/customer.parquet"))((d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + k.toLong * 10000000L)), "customer")

    write(copies(spark.read.parquet(s"$src/supplier.parquet"))((d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + k.toLong * 1000000L)), "supplier")

    // events.ts is INT64 TIMESTAMP(NANOS); read it as a plain nanos long
    // and write it back as one — Tables.events reads either the same way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(copies(spark.read.parquet(s"$src/events.parquet"))((d, k) =>
      d.withColumn("event_id", col("event_id") + k.toLong * 100000000L)
        .withColumn("user_id", col("user_id") + k.toLong * 10000000L)), "events")

    // documents: word-suffix per copy -> cross-copy shingle sets disjoint
    // (or, under --shared-vocab, verbatim text with disjoint ids -> every
    // posting list grows ×factor)
    write(copies(spark.read.parquet(s"$src/documents.parquet"))((d, k) =>
      if (k == 0) d
      else {
        val moved = d.withColumn("doc_id", col("doc_id") + k.toLong * 100000L)
        if (sharedVocab) moved
        else moved.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"~$k"))), " "))
      }), "documents")

    // embeddings: rotate by k mod dim; once rotations wrap, flip the sign
    // of alternating coordinates too (k=r and k=r+dim stay distinct and
    // uncorrelated). A bare rotation by k ≥ dim would reduce to k mod dim —
    // at factor 100, copy 64 of a 64-dim corpus would be an EXACT clone of
    // copy 0 and every vector would gain a planted twin, quadratically
    // poisoning the LSH pair counts the scaling run is supposed to measure.
    if (wanted("embeddings")) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      require(factor <= 2 * dim,
        s"embedding perturbations support at most 2*dim=${2 * dim} distinct copies")
      write(copies(emb)((d, k) =>
        if (k == 0) d
        else {
          val r = k % dim
          val rotated =
            if (r == 0) col("embedding")
            else concat(slice(col("embedding"), r + 1, dim - r),
              slice(col("embedding"), 1, r))
          val perturbed =
            if (k < dim) rotated
            else zip_with(rotated, sequence(lit(0), lit(dim - 1)),
              (x, i) => when(i % 2 === 0, -x).otherwise(x))
          d.withColumn("vec_id", col("vec_id") + k.toLong * 100000L)
            .withColumn("embedding", perturbed)
        }), "embeddings")
    }

    // dimension tables: verbatim
    Seq("part", "orders", "nation", "region").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    spark.stop()
  }
}
