package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan hygiene sweep over every SparkEntry query: counts shuffles, flags
  * the scale-killers (cartesian products, nested-loop joins over
  * non-trivial inputs, windows without partitioning over data-sized
  * input), and prints one line per query. `runMain graft.tools.PlanAudit
  * [sfDir]` — exits 1 if a NEW red flag appears (the known-benign ones are
  * allowlisted with their reasons).
  */
object PlanAudit {

  // deliberate exceptions, with the reason they are safe
  private val allowedCartesian = Set(
    "q_embed_neardup", // id-bounded (maxId) theta-join: candidate set fixed-size by construction
    "q_tfidf",         // crossJoin(broadcast(nDocs)): ONE-row scalar side (corpus doc count)
    "q_unigram_logprob", // crossJoin(broadcast(total)): ONE-row scalar side (r14 — replaced a separate driver count action)
    "q_bigram_logprob",  // crossJoin(broadcast(V)): ONE-row scalar side (r14 — replaced a separate driver count action)
    "q_ctfidf",        // crossJoin(broadcast(A)): ONE-row scalar side (r14 — replaced two driver count actions)
    "q_ivf_recall",    // crossJoin of two ONE-row aggregates (overlap count × candidate count)
    "q_jl_project",    // crossJoin of two ONE-row aggregates (overlap count × mean ratio)
    "q_ivfpq_recall",  // crossJoins of three ONE-row aggregates (overlap × candidates × total)
    "q_ivfpq_incr",    // same serving report as q_ivfpq_recall (one-row aggregates)
    "q_ivfpq_delete",  // same serving report (one-row aggregates)
    "q_ivfpq_merge",   // same serving report (one-row aggregates)
    "q_ivfpq_rerank",  // crossJoins of four ONE-row aggregates (two overlaps × candidates × total)
    "q_quantile_sketch", // ONE-row stats cross joins + range joins of the 5-quantile literal against ≤64 bin rows / the domain-bounded length histogram
    "q_kmv_overlap",   // the DISTINCT-GROUPS (20 sources) `<` self-join building the pair matrix — |groups|² rows by definition, independent of corpus size; appears once per tagged branch (×2)
    "q_hist_drift"     // crossJoins of ONE-row totals (n_ref, n_live, psi) against the ≤40-bin grid
  )
  private val allowedGlobalWindow = Set(
    "q_embed_topk", // rank over 20 post-limit rows, not data-sized input
    "q_vocab",      // rank over ≤16 post-limit vocab rows (Vocab.build)
    "q_token_ids",  // same vocab rank window feeding the broadcast join
    "q_hybrid_rrf", // two rank windows, each over a 20-row post-limit list
    "q_hybrid_indexed", // same: two rank windows over ≤20-row serve lists
    "q_zipf",       // rank + cumsum over ≤50 post-limit vocab rows
    "q_retrieval_eval", // rank over the ≤20 post-limit served rows
    "q_cms_heavy",     // rank over the ≤12 post-limit probe rows
    "q_quantile_sketch" // cumsums over the ≤64-bin and domain-bounded histograms
  )

  /** Pinned per-query shuffle counts (tools/plan_baseline.json). A
    * refactor or dependency bump that silently adds an exchange to an
    * existing query fails the audit; intentional plan changes re-pin
    * with `--write-baseline`. Queries not yet in the baseline are
    * reported but don't fail (they get pinned on the next write).
    * Counts are plan-shape (exchanges), pinned at the default sf0.001
    * audit input — compare at the same sf, since join-strategy choices
    * (broadcast vs shuffle) are size-dependent.
    */
  private val BaselinePath =
    java.nio.file.Paths.get("tools/plan_baseline.json")

  private def readBaseline(): Map[String, Int] =
    if (!java.nio.file.Files.exists(BaselinePath)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(BaselinePath), "UTF-8")
      """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toInt).toMap
    }

  private def writeBaseline(counts: Seq[(String, Int)]): Unit = {
    // provenance first ("_"-prefixed metadata; readBaseline's numeric-value
    // regex skips string-valued keys, so these never parse as pins)
    val prov = Provenance.jsonFields.replace("\",\"", "\",\n  \"")
    val json = counts.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": $v""" }
      .mkString(s"{\n  $prov,\n", ",\n", "\n}\n")
    java.nio.file.Files.write(BaselinePath, json.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val writeBase = args.contains("--write-baseline")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.excludedRules", graft.SessionTuning.ExcludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps the plan in AdaptiveSparkPlanExec and hides the subtree
      // until execution; static audit needs the fully-prepared plan
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val baseline = if (writeBase) Map.empty[String, Int] else readBaseline()
    var measured = List.empty[(String, Int)]
    var failures = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
          p.collect(pf) ++ p.subqueries.flatMap(collectAll(_)(pf))
        val shuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }.size
        val cartesian = collectAll(plan) { case c: CartesianProductExec => c }.size
        val bnl = collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.size
        val globalWindows = collectAll(plan) {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.size
        val flags = List(
          if (cartesian > 0 && !allowedCartesian(name)) Some(s"CARTESIAN×$cartesian") else None,
          if (bnl > 0 && !allowedCartesian(name)) Some(s"NESTEDLOOP×$bnl") else None,
          if (globalWindows > 0 && !allowedGlobalWindow(name)) Some(s"GLOBALWINDOW×$globalWindows") else None
        ).flatten
        measured ::= name -> shuffles
        val drift = baseline.get(name) match {
          case Some(base) if shuffles > base =>
            Some(s"SHUFFLE-REGRESSION $base→$shuffles")
          case Some(base) if shuffles < base =>
            println(f"$name%-28s shuffles=$shuffles%-3d improved from $base (re-pin with --write-baseline)")
            None
          case None if baseline.nonEmpty =>
            println(f"$name%-28s shuffles=$shuffles%-3d unpinned (new query; --write-baseline to pin)")
            None
          case _ => None
        }
        val allFlags = flags ++ drift
        val status = if (allFlags.isEmpty) "ok" else allFlags.mkString(",")
        println(f"$name%-28s shuffles=$shuffles%-3d $status")
        if (allFlags.nonEmpty) failures ::= s"$name: ${allFlags.mkString(",")}"
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(f"$name%-28s ERROR ${e.getMessage.take(100)}")
          failures ::= s"$name: ${e.getMessage.take(100)}"
      }
    }
    spark.stop()
    if (writeBase && failures.isEmpty) {
      writeBaseline(measured)
      println(s"baseline pinned: ${measured.size} queries → $BaselinePath")
    }
    if (failures.nonEmpty) {
      System.err.println(s"plan audit failures:\n${failures.sorted.mkString("\n")}")
      sys.exit(1)
    }
    // prompt CLI exit on success too — local[n] shutdown otherwise
    // lingers minutes after the audit output (VERDICT r8 nit 3)
    sys.exit(0)
  }
}
