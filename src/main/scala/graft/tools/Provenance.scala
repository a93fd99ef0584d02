package graft.tools

/** Provenance stamps for repo-side artifacts (bench_detail.json,
  * verify_errors.json, plan_baseline.json): the git commit and UTC
  * generation time distinguish a freshly regenerated artifact from a
  * stale one left by an earlier round. Keys are underscore-prefixed so
  * consumers iterating the artifact's real entries (query→value maps)
  * can skip metadata by convention.
  */
object Provenance {

  /** HEAD commit of the git repo at the process CWD, or "unknown" when
    * git is unavailable (e.g. artifacts regenerated outside the repo).
    */
  def commit: String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor()
      if (p.exitValue == 0 && out.matches("[0-9a-f]{40}")) out else "unknown"
    } catch { case scala.util.control.NonFatal(_) => "unknown" }

  def generatedAtUtc: String = java.time.Instant.now().toString

  /** Whether the working tree differs from the stamped commit — an
    * artifact generated from a dirty tree carries provenance that
    * cannot reproduce its content (ADVICE r11: a baseline was
    * regenerated from an uncommitted tree and stamped with a commit
    * that lacked one of its queries), so the stamp must say so.
    */
  def dirty: Boolean =
    try {
      val p = new ProcessBuilder("git", "status", "--porcelain")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor()
      p.exitValue == 0 && out.nonEmpty
    } catch { case scala.util.control.NonFatal(_) => false }

  /** `"_commit":"…","_generated_at_utc":"…"[,"_dirty_tree":true]` —
    * splice into any JSON object literal.
    */
  def jsonFields: String = {
    val d = if (dirty) ""","_dirty_tree":true""" else ""
    s""""_commit":"$commit","_generated_at_utc":"$generatedAtUtc"$d"""
  }
}
