package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side shapes — schema, partition-friendly batching, UDF
  * signatures over binary, array<float> feature columns — are real and
  * tested. The media decode itself is STUBBED with a deterministic fake
  * (this container ships no image/audio codecs); swap [[decodeStub]] for a
  * real decoder (e.g. a JNI/FFI call or mapInPandas + PIL on a Python
  * cluster) without touching any surrounding plan.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Deterministic synthetic media table derived from any source table —
    * payload bytes and metadata are functions of the id, so tests and
    * benchmarks are reproducible without binary fixtures.
    */
  def syntheticMedia(df: DataFrame, id: Column): DataFrame =
    df.select(id.cast("long").as("media_id"))
      .withColumn("payload",
        // pseudo-payload: the utf8 bytes of a seeded hex blob, length 64-4096
        encode(repeat(md5(col("media_id").cast("string")),
          (pmod(col("media_id"), lit(127)) + 2).cast("int")), "utf-8"))
      .withColumn("meta", struct(
        when(pmod(col("media_id"), lit(3)) === 0, "image/png")
          .when(pmod(col("media_id"), lit(3)) === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (pmod(col("media_id"), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("media_id"), lit(1080)) + 1).cast("int").as("height"),
        (pmod(col("media_id"), lit(60000))).cast("long").as("duration_ms")))

  // ================== STUB: media decode ==================
  // A real implementation would decode the payload (PNG/WAV/MP4) here.
  // The deterministic fake hashes payload windows into a fixed-length
  // feature vector so downstream plumbing (schema, batching, similarity)
  // is fully exercisable.
  val FeatureDim = 16

  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return null
    // accumulate in double so the fold is plain byte arithmetic any engine
    // reproduces exactly (float32 accumulation order would diverge from a
    // SQL oracle); the feature vector itself stays array<float>
    val acc = Array.ofDim[Double](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xff) / 255d
      i += 1
    }
    val n = math.max(1, payload.length / FeatureDim)
    acc.map(a => (a / n).toFloat)
  }
  // ========================================================

  val decodeStub = udf((payload: Array[Byte]) => Option(fakeDecode(payload)))

  /** Feature extraction stage: binary payload → array<float>.
    * One narrow map; batching is Spark's own columnar batching.
    */
  def extractFeatures(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("features", decodeStub(payload))

  /** Pseudo-resize: recompute metadata + re-window features (shape of an
    * image-resize stage; decode is the stub above).
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = when(greatest(w, h) <= maxSide, 1d)
      .otherwise(lit(maxSide) / greatest(w, h).cast("double"))
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms")))
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `everyMs` ms of duration). Explode is the scalable
    * shape: rows fan out within partitions, no shuffle.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.where(col("meta.mime").startsWith("video/"))
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
}
