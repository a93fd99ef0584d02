package graft

import java.nio.file.{Files, Path}

/** Run-scoped temp directories for queries that materialize a layout
  * mid-query (bucketed tables, z-ordered files, GeoJSON round-trips).
  * Each call returns a fresh unique directory; every registered root is
  * deleted recursively on JVM exit, so repeated bench reps or long verify
  * runs don't accumulate disk. (File.deleteOnExit can't remove non-empty
  * directories — hence the explicit recursive shutdown hook.)
  */
object TempDirs {

  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    roots.forEach { root =>
      try deleteRecursively(root)
      catch { case scala.util.control.NonFatal(_) => }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    // NOFOLLOW: a symlink inside a temp root must be unlinked, never
    // descended (its target is not ours to delete); close each listing
    // stream eagerly — GC rarely runs during shutdown, so relying on
    // finalization would leak one fd per directory walked
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val listing = Files.list(p)
      try listing.forEach(deleteRecursively)
      finally listing.close()
    }
    Files.deleteIfExists(p)
  }

  /** A fresh temp directory (as a string path) whose tree is removed at
    * JVM shutdown. The unique suffix doubles as a collision-free token
    * for catalog table names derived from the path.
    */
  def create(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    roots.add(dir)
    dir.toString
  }
}
