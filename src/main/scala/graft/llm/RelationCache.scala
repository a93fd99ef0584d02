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
private[graft] final class RelationCache(cap: Int = 64) {

  private val map = new java.util.LinkedHashMap[
      (String, String), (String, DataFrame)](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, String), (String, DataFrame)]): Boolean =
      size() > cap
  }

  private def sessionKey(spark: SparkSession): String =
    SessionKeys.of(spark)

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

/** A stable, never-reused id for a session: its `sessionUUID`
  * (private[sql] in the Scala signature, so read reflectively), minted
  * once per session and memoized under the session OBJECT in a
  * weak-keyed identity map — object keys can't suffer identity-hash
  * reuse after GC, and weak keys don't pin stopped sessions.
  */
private[llm] object SessionKeys {
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def of(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, s =>
      try s.getClass.getMethod("sessionUUID").invoke(s).toString
      catch { case _: ReflectiveOperationException =>
        java.util.UUID.randomUUID().toString
      })
}

/** Bounded LRU memo for driver-side relation CARDINALITIES used by the
  * serving strategy pick (round 14): a filtered serve's frac-aware
  * profit gate and its ACL join-direction choices need |allowed|, which
  * is one `count()` job per serve — measured at sv10 as essentially the
  * whole auto-vs-plain gap on the selective side (the pick itself is
  * jobless). ACLs are REUSED across requests in a serving tier, so the
  * count memoizes on the canonicalized analyzed plan (semantically
  * equal ACL expressions share an entry; exprIds are normalized away),
  * session-scoped like [[RelationCache]]. Staleness — e.g. a parquet
  * ACL directory rewritten in place so the same plan now covers
  * different files — can only skew the strategy pick and a probe's
  * join direction, never served rows: every plan the pick routes to is
  * exact, and the gate is a cost heuristic by construction. Values are
  * primitives (no plan or DataFrame retained), so the cap bounds memory
  * at ~cap keys.
  */
private[llm] final class PlanCountCache(cap: Int = 256) {

  private val map =
    new java.util.LinkedHashMap[(String, String), java.lang.Double](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), java.lang.Double])
          : Boolean =
        size() > cap
    }

  /** The memoized `df.count()`. The key digests the canonicalized plan
    * STRING plus the schema — semanticHash alone is a 32-bit value whose
    * collision would silently hand one ACL another's cardinality. Plans
    * over in-memory data ([[LocalRelation]]) are NOT memoized: their
    * plan string shows the schema but not the rows, so two distinct
    * local ACLs with one shape would share a key — and a local count is
    * jobless-cheap anyway (no file I/O to save).
    */
  def getOrCount(spark: SparkSession, df: DataFrame): Double = {
    val plan = df.queryExecution.analyzed.canonicalized
    val hasLocalData = plan.collectLeaves().exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        true
      case _ => false
    }
    if (hasLocalData) return df.count().toDouble
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((plan.toString + "|" + df.schema.catalogString)
        .getBytes("UTF-8"))
    val key = (SessionKeys.of(spark),
      digest.map("%02x".format(_)).mkString)
    map.synchronized {
      val hit = map.get(key)
      if (hit != null) return hit.doubleValue
    }
    val n = df.count().toDouble
    map.synchronized { map.put(key, java.lang.Double.valueOf(n)) }
    n
  }
}
