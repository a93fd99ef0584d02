package graft.tools

import graft.geo.Bbox
import graft.operators.{Convert, Extract}
import org.apache.spark.sql.SparkSession

/** Minimal CLI over the library operators, mirroring the reference's
  * command surface (cmd/gpq/command): convert, extract, describe, validate.
  *
  * Usage:
  *   runMain graft.tools.Gpq convert <in> <out> [--compression=c] [--input-primary-column=c]
  *       [--covering] [--row-group-length=n] [--from=geojson|parquet|geoparquet]
  *   runMain graft.tools.Gpq extract <in> <out> [--bbox=xmin,ymin,xmax,ymax]
  *       [--drop-cols=a,b] [--keep-only-cols=a,b]
  *   runMain graft.tools.Gpq describe <in>
  *   runMain graft.tools.Gpq validate <in> [--metadata-only]
  *
  * `-` pipes: as <in> reads stdin (staged to a temp file; `--from` required
  * for convert), as <out> streams the single result file to stdout.
  */
object Gpq {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("gpq")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
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

  /** Copy stdin to a temp file so the path-based operators can run on it
    * (reference command.go:38-52 reads stdin fully the same way). The
    * extension drives format auto-detection, so `--from` is required for
    * convert input; describe/validate assume parquet.
    */
  private def stageStdin(from: Option[String]): String = {
    val ext = from match {
      case Some("geojson") => ".geojson"
      case Some("geoparquet") => ".gpq"
      case Some("parquet") => ".parquet"
      case Some(other) => throw new IllegalArgumentException(s"unknown --from format: $other")
      case None => ".parquet"
    }
    val tmp = java.nio.file.Files.createTempFile("gpq-stdin", ext)
    val out = java.nio.file.Files.newOutputStream(tmp)
    try System.in.transferTo(out) finally out.close()
    tmp.toString
  }

  /** Stream a single-file result to stdout (binary-safe; Console-respecting
    * so tests can capture it).
    */
  private def emitStdout(path: String): Unit = {
    val f = new java.io.File(path)
    val files =
      if (f.isFile) Seq(f)
      else graft.meta.FooterIO.dataFiles(path)
        .map(p => new java.io.File(p.toUri.getPath))
    require(files.length == 1,
      s"stdout output requires a single output file, got ${files.length} parts")
    val in = java.nio.file.Files.newInputStream(files.head.toPath)
    try in.transferTo(scala.Console.out) finally in.close()
    scala.Console.out.flush()
  }

  /** CLI body, separated from session/exit handling for testability.
    * Returns the process exit code (1 = validation failures, like the
    * reference's validate command).
    */
  def run(spark: SparkSession, args: Array[String]): Int = {
    require(args.nonEmpty, "usage: gpq <convert|extract|describe|validate> ...")
    val cmd = args.head
    val positionalRaw = args.tail.filterNot(_.startsWith("--"))
    val flags = args.tail.filter(_.startsWith("--")).map { f =>
      f.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap

    // stdin/stdout piping: "-" as input stages stdin to a temp file; "-"
    // as output writes to a temp path and streams the single result file
    // to stdout (progress notices go to stderr in that mode)
    val toStdout = positionalRaw.lift(1).contains("-")
    val stdoutExt = flags.get("to") match {
      case Some("geojson") => ".geojson"
      case _ => ".parquet"
    }
    val tmpOut =
      if (toStdout)
        java.nio.file.Files.createTempDirectory("gpq-stdout").toString + "/out" + stdoutExt
      else ""
    val positional = positionalRaw.zipWithIndex.map { case (v, i) =>
      if (v == "-" && i == 0) {
        if (cmd == "convert")
          require(flags.contains("from"), "--from=<format> is required when reading stdin")
        stageStdin(flags.get("from"))
      } else if (v == "-" && i == 1) tmpOut
      else v
    }
    def notice(msg: String): Unit =
      if (toStdout) scala.Console.err.println(msg) else println(msg)

    val code = {
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
          notice(s"converted $in -> $out")
          0
        case "extract" =>
          val Array(in, out) = resolved(positional.take(2))
          Extract.run(spark, in, out, Extract.Options(
            bbox = flags.get("bbox").map(Bbox.fromString),
            dropCols = flags.get("drop-cols").toSeq.flatMap(_.split(",")),
            keepOnlyCols = flags.get("keep-only-cols").toSeq.flatMap(_.split(","))),
            compression = flags.getOrElse("compression", "zstd"))
          notice(s"extracted $in -> $out")
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
    if (toStdout && code == 0) emitStdout(tmpOut)
    code
  }
}
