package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's synthetic tables by an integer factor for scaling
  * benchmarks (`ScaleData <srcSfDir> <dstDir> [factor]`): a 10× sf1 run
  * against the sf0.1 bench proves no stage is accidentally quadratic.
  *
  * Each copy k gets disjoint ids AND copy-specific perturbations chosen so
  * cross-copy rows are NOT near-duplicates of each other: otherwise every
  * doc would gain factor-1 near-dup twins and the LSH pair count would grow
  * quadratically in the factor — a data artifact that would mask the
  * engine's own scaling. Documents suffix every word with ~k (disjoint
  * shingles; within-copy structure untouched); embeddings rotate the vector
  * by k positions (rotations of synthetic vectors are uncorrelated).
  * Dimension-like tables (part/nation/region/orders) copy verbatim — dims
  * scale sublinearly in real warehouses and part stays broadcastable.
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => f(df, k)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${df.count()} rows")
    }

    // fact tables: disjoint key ranges per copy
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(copies(li)((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + k.toLong * 10000000L)), "lineitem")

    val cust = spark.read.parquet(s"$src/customer.parquet")
    write(copies(cust)((d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + k.toLong * 10000000L)), "customer")

    val supp = spark.read.parquet(s"$src/supplier.parquet")
    write(copies(supp)((d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + k.toLong * 1000000L)), "supplier")

    // events.ts is INT64 TIMESTAMP(NANOS); read it as a plain nanos long
    // and write it back as one — Tables.events reads either the same way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    write(copies(ev)((d, k) =>
      d.withColumn("event_id", col("event_id") + k.toLong * 100000000L)
        .withColumn("user_id", col("user_id") + k.toLong * 10000000L)), "events")

    // documents: word-suffix per copy -> cross-copy shingle sets disjoint
    val docs = spark.read.parquet(s"$src/documents.parquet")
    write(copies(docs)((d, k) =>
      if (k == 0) d
      else d.withColumn("doc_id", col("doc_id") + k.toLong * 100000L)
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"~$k"))), " "))), "documents")

    // embeddings: rotate the vector by k -> cross-copy cosine uncorrelated
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    write(copies(emb)((d, k) =>
      if (k == 0) d
      else d.withColumn("vec_id", col("vec_id") + k.toLong * 100000L)
        .withColumn("embedding",
          concat(slice(col("embedding"), k + 1, dim - k),
            slice(col("embedding"), 1, k)))), "embeddings")

    // dimension tables: verbatim
    Seq("part", "orders", "nation", "region").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    spark.stop()
  }
}
