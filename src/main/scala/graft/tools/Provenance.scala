package graft.tools

/** Provenance stamps for repo-side artifacts (bench_detail.json,
  * verify_errors.json, plan_baseline.json): the git commit and UTC
  * generation time distinguish a freshly regenerated artifact from a
  * stale one left by an earlier round. Keys are underscore-prefixed so
  * consumers iterating the artifact's real entries (query→value maps)
  * can skip metadata by convention.
  */
object Provenance {

  /** The repo root git commands run against — pinned rather than
    * inherited from the process CWD (ADVICE r12: a bench tool launched
    * from outside the repo silently stamped artifacts "clean" because
    * `git status` ran in a non-repo directory).
    */
  private def repoRoot: java.io.File =
    new java.io.File(sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "/root/repo"))

  private def git(args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .directory(repoRoot).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor()
      if (p.exitValue == 0) Some(out) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** HEAD commit of the repo at [[repoRoot]], or "unknown" when git is
    * unavailable (e.g. artifacts regenerated outside the repo).
    */
  def commit: String =
    git("rev-parse", "HEAD").filter(_.matches("[0-9a-f]{40}"))
      .getOrElse("unknown")

  def generatedAtUtc: String = java.time.Instant.now().toString

  /** Whether the working tree's BUILD-RELEVANT files differ from the
    * stamped commit — an artifact generated from code the commit can't
    * reproduce must say so (ADVICE r11: a baseline was regenerated from
    * an uncommitted tree and stamped with a commit that lacked one of
    * its queries). None = git itself failed, which must surface as
    * "unknown" rather than silently clean (ADVICE r12).
    *
    * Scoped to src/tools/project/build.sbt (round 13): the flag exists
    * to catch UNREPRODUCIBLE MEASUREMENT CODE, and the two false-dirty
    * modes that plagued r12 artifacts are exactly files that can't
    * change a measurement — a sibling artifact written seconds earlier
    * in the same bench session (the r12 LAT sf1/sf10 stamps), and the
    * tool's own tracked output file (bench_detail.json modifies itself
    * by existing). Doc edits are likewise stamp-irrelevant. Any change
    * under the build-relevant paths counts, tracked or untracked.
    */
  def dirty: Option[Boolean] = git("status", "--porcelain").map { out =>
    out.linesIterator.exists { l =>
      l.drop(3).matches("(src/|tools/|project/|build\\.sbt).*")
    }
  }

  /** `"_commit":"…","_generated_at_utc":"…"[,"_dirty_tree":true|"unknown"]`
    * — splice into any JSON object literal.
    */
  def jsonFields: String = {
    val d = dirty match {
      case Some(true) => ""","_dirty_tree":true"""
      case Some(false) => ""
      case None => ""","_dirty_tree":"unknown""""
    }
    s""""_commit":"$commit","_generated_at_utc":"$generatedAtUtc"$d"""
  }
}
