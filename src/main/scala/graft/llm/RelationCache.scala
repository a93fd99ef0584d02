package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded LRU memo for resolved index relations (schema + file index),
  * shared by [[InvertedIndex]] and [[IvfPq]] (ADVICE r12): the old
  * unbounded ConcurrentHashMap keyed by `System.identityHashCode(session)`
  * leaked entries for stopped sessions / deleted temp indexes forever,
  * and an identity hash can be REUSED after GC, which could hand a new
  * session a DataFrame bound to a dead one. Keys here use the session's
  * stable `sessionUUID` (never reused), and the map is capped: least-
  * recently-used entries fall out once `cap` distinct (session, dir)
  * relations are live — eviction only costs the next serve one re-listing,
  * so a long-lived multi-index driver can't accumulate unbounded schema +
  * file-index state.
  */
private[llm] final class RelationCache(cap: Int = 64) {

  private val map = new java.util.LinkedHashMap[
      (String, String), (String, DataFrame)](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String), (String, DataFrame)]): Boolean =
      size() > cap
  }

  /** A stable, never-reused id for the session: its `sessionUUID`
    * (private[sql] in the Scala signature, so read reflectively), minted
    * once per session and memoized under the session OBJECT in a
    * weak-keyed identity map — object keys can't suffer identity-hash
    * reuse after GC, and weak keys don't pin stopped sessions.
    */
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  private def sessionKey(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, s =>
      try s.getClass.getMethod("sessionUUID").invoke(s).toString
      catch { case _: ReflectiveOperationException =>
        java.util.UUID.randomUUID().toString
      })

  /** The cached relation for (session, dir) when its signature still
    * matches, else `resolve` (memoized). `sig` is the caller's staleness
    * key — a sidecar-directory listing every maintenance verb changes.
    */
  def getOrResolve(spark: SparkSession, dir: String, sig: String)(
      resolve: => DataFrame): DataFrame = {
    val key = (sessionKey(spark), dir)
    map.synchronized {
      val hit = map.get(key)
      if (hit != null && hit._1 == sig) return hit._2
    }
    val df = resolve
    map.synchronized { map.put(key, (sig, df)) }
    df
  }
}
