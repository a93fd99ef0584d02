package graft.tools

/** Provenance stamps for repo-side artifacts (bench_detail.json,
  * verify_errors.json, plan_baseline.json): the git commit and UTC
  * generation time distinguish a freshly regenerated artifact from a
  * stale one left by an earlier round. Keys are underscore-prefixed so
  * consumers iterating the artifact's real entries (query→value maps)
  * can skip metadata by convention.
  */
object Provenance {

  private def gitIn(dir: Option[java.io.File], args: String*): Option[String] =
    try {
      val pb = new ProcessBuilder(("git" +: args): _*).redirectErrorStream(true)
      dir.foreach(pb.directory)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor()
      if (p.exitValue == 0) Some(out) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The repo root git commands run against: the repository enclosing
    * the process CWD (`git rev-parse --show-toplevel`), falling back to
    * SPARK_GRAFT_REPO_ROOT. ADVICE r13: a hardcoded default root would
    * stamp artifacts with the WRONG repo's commit when the checkout
    * being measured lives elsewhere — worse than the honest "unknown"
    * that None yields here (ADVICE r12 pinned that fallback for the
    * no-repo case).
    */
  private lazy val repoRoot: Option[java.io.File] =
    gitIn(None, "rev-parse", "--show-toplevel").map(new java.io.File(_))
      .orElse(sys.env.get("SPARK_GRAFT_REPO_ROOT").map(new java.io.File(_))
        .filter(d => new java.io.File(d, ".git").exists))

  private def git(args: String*): Option[String] =
    repoRoot.flatMap(root => gitIn(Some(root), args: _*))

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
    *
    * Parsed from `--porcelain -z` (ADVICE r13): the newline format
    * quotes special-char paths and prints renames as `old -> new`, so a
    * file renamed INTO src/ or a quoted src/ path stamped false-clean.
    * With -z nothing is quoted and a rename's two paths arrive as two
    * NUL-separated tokens (new path carries the status prefix, origin
    * path follows bare) — both sides get the prefix test.
    */
  def dirty: Option[Boolean] = git("status", "--porcelain", "-z").map { out =>
    val toks = out.split('\u0000').iterator.filter(_.nonEmpty)
    val paths = scala.collection.mutable.ListBuffer.empty[String]
    while (toks.hasNext) {
      val header = toks.next() // "XY <path>"
      paths += header.drop(3)
      if (header.take(2).exists(c => c == 'R' || c == 'C') && toks.hasNext)
        paths += toks.next() // rename/copy origin path, no status prefix
    }
    paths.exists(_.matches("(src/|tools/|project/|build\\.sbt).*"))
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
