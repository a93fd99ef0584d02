package graft.tools

import graft.geo.Bbox
import graft.operators.{Convert, Extract}
import org.apache.spark.sql.SparkSession

/** Minimal CLI over the library operators, mirroring the reference's
  * command surface (cmd/gpq/command): convert, extract, describe, validate.
  *
  * Usage:
  *   runMain graft.tools.Gpq convert <in> <out> [--compression=c] [--input-primary-column=c]
  *   runMain graft.tools.Gpq extract <in> <out> [--bbox=xmin,ymin,xmax,ymax]
  *       [--drop-cols=a,b] [--keep-only-cols=a,b]
  *   runMain graft.tools.Gpq describe <in>
  *   runMain graft.tools.Gpq validate <in> [--metadata-only]
  */
object Gpq {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("gpq")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    val code = try run(spark, args) finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** CLI body, separated from session/exit handling for testability.
    * Returns the process exit code (1 = validation failures, like the
    * reference's validate command).
    */
  def run(spark: SparkSession, args: Array[String]): Int = {
    require(args.nonEmpty, "usage: gpq <convert|extract|describe|validate> ...")
    val cmd = args.head
    val positional = args.tail.filterNot(_.startsWith("--"))
    val flags = args.tail.filter(_.startsWith("--")).map { f =>
      f.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap

    {
      // URL inputs (http/https fetched; hadoop schemes passed through)
      def resolved(p: Array[String]): Array[String] =
        p.zipWithIndex.map { case (v, i) =>
          if (i == 0) graft.sources.Remote.resolve(v, Some(spark)) else v
        }
      cmd match {
        case "convert" =>
          val Array(in, out) = resolved(positional.take(2))
          Convert.run(spark, in, out, Convert.Options(
            inputPrimaryColumn = flags.get("input-primary-column"),
            compression = Some(flags.getOrElse("compression", "zstd")),
            minFeatures = flags.get("min").map(_.toInt).getOrElse(10),
            maxFeatures = flags.get("max").map(_.toInt).getOrElse(100),
            rowGroupRows = flags.get("row-group-length").map(_.toInt),
            covering = flags.contains("covering")))
          println(s"converted $in -> $out")
          0
        case "extract" =>
          val Array(in, out) = resolved(positional.take(2))
          Extract.run(spark, in, out, Extract.Options(
            bbox = flags.get("bbox").map(Bbox.fromString),
            dropCols = flags.get("drop-cols").toSeq.flatMap(_.split(",")),
            keepOnlyCols = flags.get("keep-only-cols").toSeq.flatMap(_.split(","))),
            compression = flags.getOrElse("compression", "zstd"))
          println(s"extracted $in -> $out")
          0
        case "describe" =>
          val in = graft.sources.Remote.resolve(positional.head, Some(spark))
          if (flags.contains("metadata-only"))
            println(graft.operators.Describe.metadataOnly(in))
          else println(graft.operators.Describe.json(spark, in))
          0
        case "validate" =>
          val report = graft.operators.Validate.report(spark,
            graft.sources.Remote.resolve(positional.head, Some(spark)),
            metadataOnly = flags.contains("metadata-only"))
          println(report.toJson)
          if (report.failed) 1 else 0
        case other =>
          throw new IllegalArgumentException(s"unknown command: $other")
      }
    }
  }
}
