package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c restricts the dump (scaling runs at big sf
    // target a handful of queries; the driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var errors = List.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // fatal JVM errors (OOM etc.) must abort the run, not masquerade
        // as a single failed query in a corrupted session
        System.err.println(s"[verify] $name failed: $e")
        errors ::= name -> s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query error table: a query that throws during DataFrame
    // CONSTRUCTION is otherwise invisible in CORRECTNESS (its result dir
    // simply never appears) — round 6 lost 9 queries to fixture drift with
    // no named exception anywhere in the artifacts. Written to the verify
    // out dir AND the repo so the failure is diagnosable from either.
    val errJson = errors.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // the repo copy carries provenance (commit + UTC time, "_"-prefixed
    // metadata keys) so a stale artifact from an earlier round is
    // distinguishable from a fresh empty one
    val errJsonStamped =
      if (errors.isEmpty) s"{${graft.tools.Provenance.jsonFields}}"
      else s"{${graft.tools.Provenance.jsonFields}, " + errJson.drop(1)
    try Files.writeString(Paths.get("/root/repo/verify_errors.json"), errJsonStamped + "\n")
    catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    // prompt CLI exit: a direct `java graft.Verify` invocation otherwise
    // lingers minutes in local[n] executor shutdown after all artifacts
    // are on disk (VERDICT r8 nit 3); shutdown hooks (TempDirs) still run
    sys.exit(0)
  }
}
